"""spark-submit entry point: encode a transcript parquet dataset into
an encoded-chunk table and verify the round-trip.

Usage:
    spark-submit [--master ...] --py-files pgs.zip scripts/submit_job.py \
        <input_parquet_dir> <output_table_dir> [num_chunks] [mode]

``mode`` = shuffle (default) | direct (write_table_direct: tasks read
their own input files — the pre-grouped-input plan).

Prints one JSON line with sizes, timing, and the verify result — the
north_rule deployment shape (zero JVM code, package shipped as a zip).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    src, out = sys.argv[1], sys.argv[2]
    num_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    mode = sys.argv[4] if len(sys.argv) > 4 else "shuffle"

    spark = (
        SparkSession.builder.appName("parquet_go_spark-encode")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from parquet_go_spark import table

    # Warm every executor's python worker BEFORE the timed window:
    # worker fork + numpy/pyarrow/package import + native .so dlopen is
    # ~3-5 s per executor, a fixed per-application cost a 10^12-turn
    # job amortizes to nothing (same argument as bench.py's warm
    # best-of reps). Without this the fast cells at small inputs read
    # as startup, not engine (r5: 1 GB direct decode timed 4.8 s at
    # BOTH 1 and 4 cores — all floor).
    import pyarrow as pa

    def _warm(batches):
        from parquet_go_spark import decode, encode  # noqa: F401
        from parquet_go_spark.kernels import native  # noqa: F401

        for _ in batches:
            pass
        yield pa.RecordBatch.from_pydict({"ok": pa.array([1], pa.int32())})

    n_warm = max(2 * spark.sparkContext.defaultParallelism, 2)
    spark.range(n_warm).repartition(n_warm).mapInArrow(
        _warm, "ok int").count()

    df = spark.read.parquet(src)
    if mode == "scanonly":
        # control cell: the fixed job floor (scheduling, scan, shuffle
        # write/read, Arrow JVM->Python round-trip, python-worker
        # startup) WITHOUT the codec kernels — subtracting it from the
        # encode cells isolates the engine's own scaling
        import pyarrow as pa
        from pyspark.sql import functions as F

        def passthru(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pydict(
                {"n": pa.array([n], pa.int64())}
            )

        t0 = time.time()
        staged = df.withColumn(
            "_ck", F.pmod(F.xxhash64("conv_id"), F.lit(num_chunks))
        ).repartition(2 * spark.sparkContext.defaultParallelism, "_ck")
        n = staged.mapInArrow(passthru, "n long").agg(
            F.sum("n")).collect()[0][0]
        t_floor = time.time() - t0
        print(json.dumps({"n_rows": n, "floor_s": round(t_floor, 2),
                          "executors":
                              spark.sparkContext.defaultParallelism}))
        spark.stop()
        return 0
    t0 = time.time()
    if mode == "direct":
        import glob

        files = sorted(glob.glob(f"{src}/*.parquet"))
        per = max(1, len(files) // num_chunks)
        info = table.write_table_direct(spark, files, out,
                                        files_per_chunk=per)
    else:
        info = table.write_table(df, out, num_chunks=num_chunks)
    t_enc = time.time() - t0
    t0 = time.time()
    decoded = table.read_table(spark, out)
    n_dec = decoded.count()
    t_dec = time.time() - t0

    print(json.dumps({
        "n_rows": info["n_rows"],
        "decoded_rows": n_dec,
        "raw_bytes": info["raw_bytes"],
        "enc_bytes": info["enc_bytes"],
        "ratio": round(info["raw_bytes"] / max(info["enc_bytes"], 1), 3),
        "encode_s": round(t_enc, 2),
        "decode_s": round(t_dec, 2),
        "identical_count": n_dec == info["n_rows"],
        "executors": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
