"""Table-level API: write_table / read_table / verify_roundtrip.

The user-facing equivalent of the reference's ``NewWriter``/``NewReader``
(⟨ref⟩ writer.go, reader.go), Iceberg-style: encoded chunk files + JSON
manifests with atomic snapshot commits, checkpoint resume, projection
pushdown and manifest-stats chunk skipping. Everything is DataFrame-in /
DataFrame-out; the only shuffle is the chunk-assignment repartition.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DayTimeIntervalType,
    IntegerType,
    LongType,
    MapType,
    StructField,
    StructType,
    YearMonthIntervalType,
)

from . import manifest
from .decode import make_decode_fn, prune_entries
from .encode import make_encode_fn

__all__ = ["write_table", "write_table_direct", "read_table", "compact",
           "count_rows", "column_stats", "search_text", "delete_rows", "upsert_table",
           "verify_roundtrip", "validate_schema", "TRANSCRIPT_DDL"]

DEFAULT_ROWS_PER_CHUNK = 262_144
DEFAULT_SALT_BLOCK = 65_536

# Above this many chunks the manifest plane goes DISTRIBUTED: commits
# write shard files from executor tasks (driver sees O(shards)
# summaries) and reads prune entries inside tasks (driver never
# materializes per-chunk JSON). Below it, the driver path is cheaper
# (no extra Spark stage) and easier to debug.
DISTRIBUTED_MANIFEST_MIN_CHUNKS = 4096

# upsert_table's contract is O(touched batch) on the driver; above this
# many touched chunks it is a de-facto full-table rewrite and the
# driver-side touched-set collect/decode bookkeeping stops being cheap.
UPSERT_MAX_TOUCHED_CHUNKS = 100_000

# conservative in-memory row width (transcript shape ~250 B/row) used to
# bound encode task sizes when Catalyst has no byte estimate
EST_ROW_BYTES = 256


TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def _inflight_guard(pos: int):
    """Bracket a chunk-writing op with an in-flight marker (see
    manifest.begin_inflight): expire_snapshots spares chunk/shard files
    newer than any live marker's start stamp, so a concurrent GC can
    never delete this job's uncommitted files. A daemon heartbeat
    thread refreshes the marker's liveness every INFLIGHT_HEARTBEAT_S
    so jobs longer than INFLIGHT_TTL_S — the design target is
    multi-hour 10¹²-row backfills — keep protection for their whole
    run. ``pos`` = positional index of table_dir."""
    import functools
    import threading

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            table_dir = kwargs.get("table_dir") or args[pos]
            marker = manifest.begin_inflight(table_dir)
            stop = threading.Event()

            def beat():
                while not stop.wait(manifest.INFLIGHT_HEARTBEAT_S):
                    manifest.heartbeat_inflight(marker)

            t = threading.Thread(target=beat, daemon=True,
                                 name="inflight-heartbeat")
            t.start()
            try:
                return fn(*args, **kwargs)
            finally:
                stop.set()
                manifest.end_inflight(marker)

        return wrapper

    return deco


def validate_schema(df: DataFrame, ddl: str = TRANSCRIPT_DDL) -> None:
    """Assert the DataFrame matches the declared contract (H1 parity:
    the reference validates schema trees before writing,
    ⟨ref⟩ schema/*.go). Raises ValueError listing every mismatch."""
    from pyspark.sql.types import _parse_datatype_string

    want = {f.name: f.dataType.simpleString()
            for f in _parse_datatype_string(ddl).fields}
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for name, t in want.items():
        if name not in have:
            problems.append(f"missing column {name!r} ({t})")
        elif have[name] != t:
            problems.append(f"column {name!r}: expected {t}, got {have[name]}")
    extra = set(have) - set(want)
    if extra:
        problems.append(f"unexpected columns: {sorted(extra)}")
    if problems:
        raise ValueError("schema contract violation: " + "; ".join(problems))


# ANSI interval support (parquet.thrift:165-177 INTERVAL converted
# type; Spark: DayTimeIntervalType / YearMonthIntervalType). Spark's
# Arrow UDF channel rejects interval types outright — at ANY nesting
# depth (PySparkNotImplementedError from mapInArrow/mapInPandas) — so
# the engine lowers interval leaves to their internal integer form
# JVM-side before the encode UDF: day-time = int64 microseconds,
# year-month = int32 months, both exact by definition. Nested
# occurrences (struct fields, array elements, map values) are lowered
# in place by a recursive expression (named_struct/transform/
# transform_values with null guards), and read_table restores
# JVM-side after the decode UDF with the inverse expression under ONE
# outer CAST to the manifest's ORIGINAL DDL — which also restores
# exact interval field bounds (e.g. HOUR TO MINUTE) at every level.
# The lowered ints go through the normal integer codec paths
# (delta/PFOR; nested ones through the shredded/generic nested
# codecs), which is precisely what the Parquet INTERVAL encoding does
# with its months/days/millis triple. Interval MAP KEYS stay
# unsupported (loud ValueError — no sane ordering story).
_IV_TYPES = (DayTimeIntervalType, YearMonthIntervalType)


def _contains_iv(dt) -> bool:
    from pyspark.sql.types import ArrayType

    if isinstance(dt, _IV_TYPES):
        return True
    if isinstance(dt, StructType):
        return any(_contains_iv(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _contains_iv(dt.elementType)
    if isinstance(dt, MapType):
        if _contains_iv(dt.keyType):
            raise ValueError(
                "interval-typed map keys are not supported")
        return _contains_iv(dt.valueType)
    return False


def _all_nullable(dt):
    """``dt`` with nullability forced on at every level — the decode
    path is all-nullable (schema evolution null-fills), so the restore
    cast target must not carry NOT NULL constraints from the writer's
    schema (Spark refuses nullable→non-null struct casts)."""
    from pyspark.sql.types import ArrayType

    if isinstance(dt, StructType):
        return StructType([
            StructField(f.name, _all_nullable(f.dataType), True,
                        f.metadata)
            for f in dt.fields])
    if isinstance(dt, ArrayType):
        return ArrayType(_all_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(dt.keyType, _all_nullable(dt.valueType), True)
    return dt


def _lower_type(dt):
    """The Arrow-safe storage type for ``dt`` (interval leaves → ints)."""
    from pyspark.sql.types import ArrayType

    if isinstance(dt, DayTimeIntervalType):
        return LongType()
    if isinstance(dt, YearMonthIntervalType):
        return IntegerType()
    if isinstance(dt, StructType):
        return StructType([
            StructField(f.name, _lower_type(f.dataType), True, f.metadata)
            for f in dt.fields])
    if isinstance(dt, ArrayType):
        return ArrayType(_lower_type(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(dt.keyType, _lower_type(dt.valueType), True)
    return dt


def _bt(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _iv_sql(ref: str, dt, lower: bool, depth: int = 0) -> str:
    """Recursive SQL rewriting interval leaves under ``ref``:
    ``lower=True`` → ints (write side), ``lower=False`` → intervals
    (read side; caller wraps in one CAST to the original DDL, which
    also restores exact field bounds everywhere)."""
    from pyspark.sql.types import ArrayType

    if isinstance(dt, DayTimeIntervalType):
        return (f"({ref} div INTERVAL '0.000001' SECOND)" if lower
                else f"({ref} * INTERVAL '0.000001' SECOND)")
    if isinstance(dt, YearMonthIntervalType):
        # div (not CAST AS INT): CAST uses the END-field unit, so an
        # INTERVAL YEAR column would store years while the restore
        # multiplies months — div by 1 month is bound-independent
        return (f"({ref} div INTERVAL '1' MONTH)" if lower
                else f"({ref} * INTERVAL '1' MONTH)")
    if isinstance(dt, StructType):
        if not _contains_iv(dt):
            return ref
        parts = ", ".join(
            "'" + f.name.replace("'", "''") + "', "
            + _iv_sql(f"{ref}.{_bt(f.name)}", f.dataType, lower, depth)
            for f in dt.fields)
        # named_struct of a NULL struct would fabricate a non-null row
        # of nulls — guard the null through explicitly
        return (f"(CASE WHEN {ref} IS NULL THEN NULL "
                f"ELSE named_struct({parts}) END)")
    if isinstance(dt, ArrayType):
        if not _contains_iv(dt.elementType):
            return ref
        v = f"_iv{depth}"
        inner = _iv_sql(v, dt.elementType, lower, depth + 1)
        return f"transform({ref}, {v} -> {inner})"
    if isinstance(dt, MapType):
        if not _contains_iv(dt.valueType):
            return ref
        k, v = f"_ivk{depth}", f"_ivv{depth}"
        inner = _iv_sql(v, dt.valueType, lower, depth + 1)
        return f"transform_values({ref}, ({k}, {v}) -> {inner})"
    return ref


def _lower_interval_df(df: DataFrame) -> tuple[DataFrame, str | None]:
    """Lower interval-bearing columns (top-level or nested) to ints;
    returns (df, original schema json to commit) — (df, None) when
    there is nothing to do."""
    if not any(_contains_iv(f.dataType) for f in df.schema.fields):
        return df, None
    orig = df.schema.json()
    exprs = []
    for f in df.schema.fields:
        if _contains_iv(f.dataType):
            low = _iv_sql(_bt(f.name), f.dataType, lower=True)
            # cast with the DataType OBJECT (not simpleString DDL):
            # field names with DDL-hostile characters stay intact
            exprs.append(
                F.expr(low).cast(_lower_type(f.dataType)).alias(f.name))
        else:
            exprs.append(F.col(f"`{f.name}`"))
    return df.select(exprs), orig


def _udf_safe_fields(
    fields: list[StructField],
) -> tuple[list[StructField], dict]:
    """Interval-bearing fields → (lowered fields for the decode UDF
    schema, restore Column by column name for the JVM-side select
    after). Lowered fields keep their metadata; restore re-attaches it."""
    out: list[StructField] = []
    restore: dict = {}
    for f in fields:
        dt = f.dataType
        if _contains_iv(dt):
            out.append(StructField(f.name, _lower_type(dt), True,
                                   f.metadata))
            up = F.expr(_iv_sql(_bt(f.name), dt, lower=False)).cast(
                _all_nullable(dt))
            restore[f.name] = (up.alias(f.name, metadata=f.metadata)
                               if f.metadata else up.alias(f.name))
        else:
            out.append(f)
    return out, restore


@_inflight_guard(1)
def write_table(
    df: DataFrame,
    table_dir: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_chunks: int | None = None,
    rows_per_chunk: int = DEFAULT_ROWS_PER_CHUNK,
    salt_block: int = DEFAULT_SALT_BLOCK,
    overrides: dict[str, tuple[str, str]] | None = None,
    resume: bool = True,
    chunk_expr=None,
    chunk_prefix: str = "",
    append: bool = False,
    shuffle: bool = True,
    bloom_cols: tuple[str, ...] = (),
    token_bloom_cols: tuple[str, ...] = (),
    distributed_commit: bool | None = None,
) -> dict:
    """Encode ``df`` into an Iceberg-style encoded-chunk table.

    Default chunk assignment = pmod(xxhash64(key_cols[0],
    key_cols[1] // salt_block), num_chunks): deterministic across reruns
    (resume) and skew-bounded (long conversations split at turn-block
    boundaries). Pass ``chunk_expr`` (a Column producing an integer) for
    value-range chunking instead — range chunks give tight per-chunk
    min/max stats, which is what makes manifest chunk-skipping
    selective (Parquet row-group pruning parity).

    ``append=True`` merges this write's chunk entries into the current
    snapshot instead of replacing it (same-id entries override — writes
    are idempotent per chunk id, which with a ``chunk_prefix`` per
    micro-batch gives exactly-once streaming ingestion even when a
    batch is replayed).

    ``shuffle=False`` (locality mode) skips the exchange entirely: each
    input partition becomes one chunk (sorted locally on key_cols).
    Use when the input is already conversation-grouped — the common
    re-encode case at scale — but note chunk ids then follow the scan's
    partition ordinals, so resume requires a stable input listing.

    ``distributed_commit`` (default: auto above
    DISTRIBUTED_MANIFEST_MIN_CHUNKS, fresh commits only): manifest
    shard files are written by a second Spark stage grouped by shard;
    the driver collects only O(shards) summaries instead of one JSON
    row per chunk — at the 10¹²-turn frame (~4M chunks) the per-chunk
    path would push GBs of JSON through the driver.
    """
    df, orig_schema_json = _lower_interval_df(df)
    schema_json = orig_schema_json or df.schema.json()
    entries_df, extra = _stage_encode(
        df, table_dir, key_cols, num_chunks, rows_per_chunk, salt_block,
        overrides, resume, chunk_expr, chunk_prefix, bloom_cols, shuffle,
        token_bloom_cols,
    )
    if distributed_commit is None:
        distributed_commit = (
            (extra.get("num_chunks") or 0) >= DISTRIBUTED_MANIFEST_MIN_CHUNKS
        )
    if distributed_commit:
        refs = _write_shards_distributed(entries_df, table_dir)
        if append:
            snapshot = _commit_append_distributed(
                df.sparkSession, table_dir, refs,
                schema_ddl=schema_json, extra=extra,
            )
        else:
            snapshot = manifest.commit_shards(
                table_dir, refs, schema_ddl=schema_json, extra=extra,
            )
        return {
            "snapshot_id": snapshot,
            "n_chunks": sum(r["n_chunks"] for r in refs),
            "n_rows": sum(r["n_rows"] for r in refs),
            "raw_bytes": sum(r["raw_bytes"] for r in refs),
            "enc_bytes": sum(r["enc_bytes"] for r in refs),
            "reused_chunks": sum(r["reused_chunks"] for r in refs),
        }
    entries = [json.loads(r.entry_json) for r in entries_df.collect()]
    snapshot = manifest.commit(
        table_dir, entries, schema_ddl=schema_json,
        extra=extra, append=append,
    )
    return {
        "snapshot_id": snapshot,
        "n_chunks": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "raw_bytes": sum(e["raw_bytes"] for e in entries),
        "enc_bytes": sum(e["enc_bytes"] for e in entries),
        "reused_chunks": sum(1 for e in entries if e.get("reused")),
    }


def _stage_encode(
    df: DataFrame,
    table_dir: str,
    key_cols: tuple[str, ...],
    num_chunks: int | None,
    rows_per_chunk: int,
    salt_block: int,
    overrides: dict | None,
    resume: bool,
    chunk_expr,
    chunk_prefix: str,
    bloom_cols: tuple[str, ...],
    shuffle: bool,
    token_bloom_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, dict]:
    """Build the (lazy) encode job: stage → mapInArrow → one
    (chunk_id, entry_json) row per chunk. Callers either collect the
    rows (driver commit, small tables) or pipe them into the
    shard-writing stage (distributed commit)."""
    # NOTE: no JVM sortWithinPartitions — the encode kernel sorts each
    # partition with pyarrow (same total order on the unique keys, so
    # chunk bytes and data_crc are identical), which is ~20x cheaper
    # than Spark's row sorter on these payloads
    if not shuffle:
        staged = df
        extra = {"mode": "locality", "key_cols": list(key_cols)}
    else:
        size = None
        try:
            est = (
                df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes()
            )
            # py4j returns java.math.BigInteger for huge "unknown"
            # estimates but a plain int for normal ones — handle both
            est = int(est.toString()) if hasattr(est, "toString") else int(est)
            if 0 < est < (1 << 50):  # Catalyst "unknown" is huge
                size = est
        except Exception:
            pass
        n_rows = None
        if num_chunks is None:
            # prefer Catalyst's size estimate (no extra job); fall back
            # to an exact count. Both are deterministic for the same
            # input, which resume's chunk-id stability requires.
            if size is not None:
                # rows_per_chunk ≈ 64 MB of in-memory rows at the
                # transcript shape (~250 B/row)
                num_chunks = max(1, math.ceil(size / (64 << 20)))
            else:
                n_rows = df.count()
                num_chunks = max(1, math.ceil(n_rows / rows_per_chunk))
        if chunk_expr is not None:
            ck = F.pmod(chunk_expr.cast("long"), F.lit(num_chunks))
        else:
            salt = (
                F.floor(F.col(key_cols[1]) / F.lit(salt_block))
                if len(key_cols) > 1
                else F.lit(0)
            )
            ck = F.pmod(F.xxhash64(F.col(key_cols[0]), salt), F.lit(num_chunks))
        # shuffle PARTITION count is decoupled from CHUNK count: chunk
        # identity is the _ck value (the kernel sorts its partition and
        # slices every _ck group it holds), so chunk bytes / resume /
        # manifests are partition-count-independent. Tasks are sized
        # for the cluster — ~4 waves per core (straggler overlap; 2
        # waves measurably lost N→4N efficiency to the last-wave tail),
        # at most ~128 MB of input per task (python-worker working set)
        # — instead of one JVM↔Python round-trip per chunk (at
        # one-chunk-per-task a 4M-chunk table would schedule 4M tiny
        # tasks; at local[1] it made 64 round-trips for 204 MB)
        par = df.sparkSession.sparkContext.defaultParallelism
        floor_parts = 4 * max(par, 1)
        if size is not None:
            floor_parts = max(floor_parts, math.ceil(size / (128 << 20)))
        elif n_rows is not None:
            # no Catalyst estimate (post-shuffle/UDF sources): bound the
            # per-task working set from the exact count already taken
            floor_parts = max(
                floor_parts, math.ceil(n_rows * EST_ROW_BYTES / (128 << 20))
            )
        else:
            # explicit num_chunks AND no size info at all: fall back to
            # one chunk per task so tasks stay bounded at chunk size
            # (the kernel materializes its whole partition via Arrow)
            floor_parts = max(floor_parts, num_chunks)
        n_parts = max(1, min(num_chunks, floor_parts))
        staged = df.withColumn("_ck", ck).repartition(n_parts, "_ck")
        extra = {"num_chunks": num_chunks, "salt_block": salt_block,
                 "key_cols": list(key_cols)}
    encode_fn = make_encode_fn(table_dir, key_cols, overrides, resume,
                               chunk_prefix, bloom_cols, token_bloom_cols)
    entries_df = staged.mapInArrow(
        encode_fn, "chunk_id string, entry_json string"
    )
    return entries_df, extra


def _encode_entries(*args, **kwargs) -> tuple[list[dict], dict]:
    """Eager variant (driver-side entry list) for the internal rewrite
    ops (compact/delete/upsert), whose touched-entry sets are O(batch)."""
    entries_df, extra = _stage_encode(*args, **kwargs)
    return [json.loads(r.entry_json) for r in entries_df.collect()], extra


def _write_shards_distributed(entries_df: DataFrame,
                              table_dir: str) -> list[dict]:
    """Second encode stage: group entry rows by manifest shard and let
    each task write ONE immutable shard file; return O(shards)
    summaries. Shard files carry a per-commit token (not the snapshot
    id — that is assigned later under the commit lock). Pending shards
    written before the commit are spared by a concurrent
    expire_snapshots via the GC floor (the caller's in-flight marker,
    see manifest._cleanup_manifest_files); crashed attempts' orphan
    shards lose protection when the marker passes INFLIGHT_TTL_S and
    the next expire sweeps them, exactly like Iceberg orphan files."""
    import uuid

    token = uuid.uuid4().hex[:12]

    def write_shard(key, pdf):
        import json as _json
        import os as _os

        from . import manifest as M

        shard = key[0]
        entries = sorted(
            (_json.loads(s) for s in pdf["entry_json"]),
            key=lambda e: e["chunk_id"],
        )
        fname = f"manifest-{token}-{shard or 'root'}.json"
        fpath = _os.path.join(table_dir, "_manifests", fname)
        M._atomic_write_json(fpath, {"entries": entries})
        return pd.DataFrame([{
            "shard": shard,
            "file": _os.path.join("_manifests", fname),
            "n_chunks": len(entries),
            "n_rows": sum(e["n_rows"] for e in entries),
            "raw_bytes": sum(e["raw_bytes"] for e in entries),
            "enc_bytes": sum(e["enc_bytes"] for e in entries),
            "reused_chunks": sum(1 for e in entries if e.get("reused")),
        }])

    shard = F.when(
        F.length("chunk_id") > 4,
        F.expr("substring(chunk_id, 1, length(chunk_id) - 4)"),
    ).otherwise(F.lit(""))
    rows = (
        entries_df.withColumn("shard", shard)
        .groupBy("shard")
        .applyInPandas(
            write_shard,
            "shard string, file string, n_chunks long, n_rows long, "
            "raw_bytes long, enc_bytes long, reused_chunks long",
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def _commit_append_distributed(
    spark: SparkSession,
    table_dir: str,
    new_refs: list[dict],
    schema_ddl: str,
    extra: dict | None,
    max_retries: int = 10,
) -> int:
    """APPEND commit at manifest scale: the batch's shard files are
    already on disk (written by encode tasks); shards the batch shares
    with the parent are merged INSIDE Spark tasks (read parent shard +
    batch shard, merge by chunk_id — same-id overrides, the idempotent
    replay contract — write one immutable merged file); untouched
    parent refs carry forward, pre-totals refs are enriched task-side.
    The driver only ever holds O(shards) summaries — a million-chunk
    backfill append no longer funnels per-chunk entry JSON through
    ``manifest.commit(append=True)``.

    Optimistic concurrency: the merge runs against a parent read
    OUTSIDE the commit lock; ``commit_shards(expect_parent=...)``
    re-checks under the lock and raises StaleParent if another commit
    landed, in which case the merge re-runs against the new parent."""
    import uuid

    for _attempt in range(max_retries):
        prev = manifest.load_refs(table_dir)
        if prev is not None and prev.get("manifest_shards") is None:
            # pre-0.2 single-file parent: every entry lives in one flat
            # file — there is nothing shard-incremental to preserve, and
            # legacy tables predate the scale this path exists for
            raise ValueError(
                "distributed append onto a pre-0.2 single-file manifest "
                "is not supported; compact() or rewrite the table first"
            )
        parent_id = prev["snapshot_id"] if prev else None
        prev_refs = {r["shard"]: dict(r)
                     for r in (prev["manifest_shards"] if prev else [])}
        new_by_shard = {r["shard"]: r for r in new_refs}
        token = uuid.uuid4().hex[:12]
        work = []
        for s in sorted(set(prev_refs) & set(new_by_shard)):
            work.append((s, prev_refs[s]["file"], new_by_shard[s]["file"]))
        for s, r in prev_refs.items():
            if s not in new_by_shard and "n_rows" not in r:
                work.append((s, r["file"], None))  # enrich totals only

        def merge_shards(pdfs):
            import json as _json
            import os as _os

            from . import manifest as M

            for pdf in pdfs:
                out = []
                for shard, pfile, nfile in pdf.itertuples(index=False):
                    with open(_os.path.join(table_dir, pfile)) as f:
                        parent_ents = _json.load(f)["entries"]
                    if not isinstance(nfile, str):  # null → enrich-only
                        ents = parent_ents
                        file_rel = pfile
                    else:
                        merged = {e["chunk_id"]: e for e in parent_ents}
                        with open(_os.path.join(table_dir, nfile)) as f:
                            for e in _json.load(f)["entries"]:
                                merged[e["chunk_id"]] = e
                        ents = sorted(merged.values(),
                                      key=lambda e: e["chunk_id"])
                        if ents == parent_ents:  # idempotent replay
                            file_rel = pfile
                        else:
                            fname = (f"manifest-{token}-m-"
                                     f"{shard or 'root'}.json")
                            fpath = _os.path.join(table_dir, "_manifests",
                                                  fname)
                            M._atomic_write_json(fpath, {"entries": ents})
                            file_rel = _os.path.join("_manifests", fname)
                    out.append({
                        "shard": shard, "file": file_rel,
                        "n_chunks": len(ents),
                        "n_rows": sum(e["n_rows"] for e in ents),
                        "raw_bytes": sum(e["raw_bytes"] for e in ents),
                        "enc_bytes": sum(e["enc_bytes"] for e in ents),
                    })
                yield pd.DataFrame(out)

        merged_refs: dict[str, dict] = {}
        if work:
            par = min(len(work), spark.sparkContext.defaultParallelism) or 1
            wdf = spark.createDataFrame(
                pd.DataFrame(work,
                             columns=["shard", "parent_file", "new_file"]),
                "shard string, parent_file string, new_file string",
            ).repartition(par)
            rows = wdf.mapInPandas(
                merge_shards,
                "shard string, file string, n_chunks long, n_rows long, "
                "raw_bytes long, enc_bytes long",
            ).collect()
            merged_refs = {r["shard"]: r.asDict() for r in rows}

        final: list[dict] = []
        for s, r in prev_refs.items():
            if s in new_by_shard:
                final.append(merged_refs[s])
            else:
                final.append(merged_refs.get(s, r))
        for s, r in new_by_shard.items():
            if s not in prev_refs:
                final.append({k: r[k] for k in
                              ("shard", "file", "n_chunks", "n_rows",
                               "raw_bytes", "enc_bytes")})
        try:
            return manifest.commit_shards(
                table_dir, final, schema_ddl=schema_ddl, extra=extra,
                expect_parent=parent_id,
            )
        except manifest.StaleParent:
            continue  # another commit landed: re-merge against it
    raise manifest.CommitConflict(
        f"append commit lost the parent race {max_retries} times"
    )


def read_table(
    spark: SparkSession,
    table_dir: str,
    columns: list[str] | None = None,
    predicates: dict | None = None,
    parallelism: int | None = None,
    push_row_filter: bool = False,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Decode an encoded table back to a DataFrame.
    ``snapshot_id`` → time travel to a historical snapshot.

    ``columns`` → projection pushdown (only those blobs are decoded);
    ``predicates`` {col: (lo, hi)} → manifest-stats chunk skipping, and
    with ``push_row_filter=True`` also blob-level late materialization:
    predicate columns decode first, non-matching rows are dropped
    before the other blobs are touched, so the returned DataFrame
    contains exactly the matching rows (no residual filter needed).
    """
    refs = manifest.load_refs(table_dir, snapshot_id=snapshot_id)
    if refs is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    # distributed manifest plane: above the threshold the per-chunk
    # entries are parsed, layout-checked and stats/bloom-pruned INSIDE
    # executor tasks (one task per shard file) — the driver handles
    # only shard refs, so the read path scales to any chunk count
    distributed = (
        refs.get("manifest_shards") is not None
        and refs.get("n_chunks", 0) >= DISTRIBUTED_MANIFEST_MIN_CHUNKS
    )
    listing = refs
    if not distributed:
        listing = manifest.load(table_dir, snapshot_id=snapshot_id)
        manifest.check_chunk_layout(listing["entries"])
    schema = StructType.fromJson(json.loads(listing["schema_ddl"]))
    by_name = {f.name: f for f in schema.fields}
    all_cols = list(by_name)
    columns = columns or all_cols
    # all fields nullable: schema evolution null-fills columns that
    # predate a chunk, regardless of the writer-side nullability.
    # "base.child" projects ONE struct child as a flat column (shredded
    # structs then read only that child's bytes from storage).
    fields = []
    for c in columns:
        base, _, sub = c.partition(".")
        if base not in by_name:
            raise KeyError(
                f"column {c!r} not in table schema (have {all_cols})"
            )
        f = by_name[base]
        if sub:
            from pyspark.sql.types import ArrayType

            dt = f.dataType
            if (isinstance(dt, ArrayType)
                    and isinstance(dt.elementType, StructType)):
                # list<struct> child projection: one array<childT> per
                # row (the shredded layout reads only that child's
                # bytes — Dremel-style nested projection through the
                # list wrapper)
                child = {cf.name: cf
                         for cf in dt.elementType.fields}.get(sub)
                if child is None:
                    raise KeyError(
                        f"struct {base!r} elements have no field {sub!r}"
                    )
                fields.append(StructField(
                    c, ArrayType(child.dataType, True), nullable=True
                ))
            elif isinstance(dt, StructType):
                child = {cf.name: cf for cf in dt.fields}.get(sub)
                if child is None:
                    raise KeyError(f"struct {base!r} has no field {sub!r}")
                fields.append(StructField(c, child.dataType, nullable=True))
            elif isinstance(dt, MapType):
                # map-key projection: "attrs.k" → the value under key
                # "k" per row (null where absent). Shredded map chunks
                # read only the shell + that key's value blob.
                fields.append(StructField(c, dt.valueType, nullable=True))
            else:
                raise KeyError(f"{base!r} is not a struct, array<struct> "
                               f"or map; cannot project {c!r}")
        else:
            fields.append(
                StructField(f.name, f.dataType, nullable=True,
                            metadata=f.metadata)
            )
    # interval columns: decode as their lowered int form, cast back
    # JVM-side after the UDF (sub_schema = what the caller receives)
    udf_fields, iv_restore = _udf_safe_fields(fields)
    sub_schema = StructType(fields)
    udf_schema = StructType(udf_fields)

    if distributed:
        par = parallelism or spark.sparkContext.defaultParallelism
        files_df = _manifest_files_df(
            spark, table_dir, refs, predicates
        ).repartition(par)
    else:
        entries = prune_entries(listing["entries"], predicates)
        if not entries:
            return spark.createDataFrame([], sub_schema)
        import os

        # expectation columns travel WITH each file path (no driver-side
        # dict in the closure): the decoder checks the file's embedded
        # entry against the snapshot's, so a chunk file rewritten in
        # place after this snapshot fails loudly instead of silently
        # decoding newer data (time-travel integrity).
        files_pdf = pd.DataFrame(
            {
                "file": [os.path.join(table_dir, e["file"])
                         for e in entries],
                "chunk_id": [e["chunk_id"] for e in entries],
                "data_crc": pd.array([e.get("data_crc") for e in entries],
                                     dtype="Int64"),
                "enc_bytes": pd.array([e.get("enc_bytes") for e in entries],
                                      dtype="Int64"),
            }
        )
        par = parallelism or min(len(entries),
                                 spark.sparkContext.defaultParallelism)
        files_df = spark.createDataFrame(
            files_pdf,
            "file string, chunk_id string, data_crc long, enc_bytes long",
        ).repartition(par)
    if push_row_filter and predicates:
        from .decode import normalize_predicate

        row_filter = {
            c: normalize_predicate(p)[:2] for c, p in predicates.items()
        }
    else:
        row_filter = None
    try:  # schema evolution: null-fill columns missing from old chunks
        from pyspark.sql.pandas.types import to_arrow_schema

        column_types = {f.name: f.type for f in to_arrow_schema(udf_schema)}
    except Exception:
        column_types = {}
    out = files_df.mapInArrow(
        make_decode_fn(columns, row_filter=row_filter,
                       column_types=column_types),
        udf_schema,
    )
    if iv_restore:
        out = out.select([
            iv_restore[f.name] if f.name in iv_restore
            else F.col(f"`{f.name}`")
            for f in udf_fields
        ])
    return out


@_inflight_guard(1)
def compact(
    spark: SparkSession,
    table_dir: str,
    min_rows: int = 32_768,
    rows_per_chunk: int = DEFAULT_ROWS_PER_CHUNK,
) -> dict:
    """Merge small chunks into full-size ones (Iceberg
    rewrite-data-files parity). Streaming ingestion leaves one chunk
    set per micro-batch; compaction decodes the small ones, re-encodes
    them under a fresh chunk namespace, and commits keep + new minus
    superseded in ONE snapshot — a crash before the commit leaves the
    table exactly as it was (the orphaned new files are overwritten by
    the retry), never an intermediate snapshot with duplicate rows.

    At scale this is a normal Spark job over only the small chunks —
    the large ones are untouched (no read amplification)."""
    import os

    listing = manifest.load(table_dir)
    if listing is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    entries = listing["entries"]
    manifest.check_chunk_layout(entries)
    small = [e for e in entries if e["n_rows"] < min_rows]
    if len(small) < 2:
        return {"compacted_chunks": 0, "n_chunks": len(entries)}
    keep = [e for e in entries if e["n_rows"] >= min_rows]
    key_cols = tuple(listing["extra"].get("key_cols")
                     or ["conv_id", "turn_idx"])

    # all fields nullable: schema-evolution null-fills columns that
    # predate a chunk (same forcing read_table applies). Interval
    # columns decode/re-encode in their lowered int form (chunk bytes
    # store ints; the commit keeps the original interval DDL).
    schema = StructType(_udf_safe_fields(
        [
            StructField(f.name, f.dataType, nullable=True, metadata=f.metadata)
            for f in StructType.fromJson(json.loads(listing["schema_ddl"])).fields
        ]
    )[0])
    cols = [f.name for f in schema.fields]
    files = [os.path.join(table_dir, e["file"]) for e in small]
    par = min(len(files), spark.sparkContext.defaultParallelism)
    files_df = spark.createDataFrame(
        pd.DataFrame({"file": files}), "file string"
    ).repartition(par)
    # same null-fill mapping read_table uses: small chunks written
    # before a schema-evolution append may predate newer columns
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        column_types = {f.name: f.type for f in to_arrow_schema(schema)}
    except Exception:
        column_types = {}
    small_df = files_df.mapInArrow(
        make_decode_fn(cols, column_types=column_types), schema
    )

    prefix = f"c{listing['snapshot_id'] + 1:04d}-"
    n_small_rows = sum(e["n_rows"] for e in small)
    new_entries, _ = _encode_entries(
        small_df, table_dir, key_cols=key_cols,
        num_chunks=max(1, math.ceil(n_small_rows / rows_per_chunk)),
        rows_per_chunk=rows_per_chunk, salt_block=DEFAULT_SALT_BLOCK,
        overrides=None, resume=False, chunk_expr=None,
        chunk_prefix=prefix, bloom_cols=(), shuffle=True,
    )
    small_ids = {e["chunk_id"] for e in small}
    final_entries = keep + new_entries
    snap = manifest.commit(
        table_dir, final_entries, schema_ddl=listing["schema_ddl"],
        extra={**listing["extra"], "compacted_from": sorted(small_ids)},
    )
    for e in small:
        try:
            os.unlink(os.path.join(table_dir, e["file"]))
        except OSError:
            pass
    return {
        "snapshot_id": snap,
        "compacted_chunks": len(small),
        "new_chunks": len(new_entries),
        "n_chunks": len(final_entries),
        "n_rows": sum(e["n_rows"] for e in final_entries),
    }


@_inflight_guard(2)
def write_table_direct(
    spark: SparkSession,
    input_files: list[str],
    table_dir: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    files_per_chunk: int = 1,
    overrides: dict[str, tuple[str, str]] | None = None,
    resume: bool = True,
    chunk_prefix: str = "",
    append: bool = False,
    bloom_cols: tuple[str, ...] = (),
    distributed_commit: bool | None = None,
) -> dict:
    """Direct-path encode for pre-grouped input: each chunk = one group
    of input parquet files, read INSIDE the task with pyarrow (no JVM
    scan, no shuffle, no Arrow JVM→Python transfer — only file paths
    cross the boundary). Chunk ids follow the sorted input listing, so
    resume requires a stable listing (same caveat as locality mode).

    ``distributed_commit``: same semantics as write_table — manifest
    shards written by tasks, driver commits O(shards) summaries; auto
    above DISTRIBUTED_MANIFEST_MIN_CHUNKS for fresh commits."""
    from .encode import make_direct_encode_fn

    files = sorted(input_files)
    groups = [files[i : i + files_per_chunk]
              for i in range(0, len(files), files_per_chunk)]
    rows = [(f"{chunk_prefix}{i:06d}", json.dumps(g))
            for i, g in enumerate(groups)]
    par = min(len(rows), spark.sparkContext.defaultParallelism) or 1
    # repartitionByRange, not repartition(par): round-robin starts at a
    # RANDOM bucket per input partition, so the chunk->task grouping —
    # and with it the per-task FSST symbol-table reuse groups, hence
    # the encoded bytes — changed run to run (r5: two identical 4-core
    # direct runs produced 121327330 vs 120661853 B). Range partitioning
    # on the zero-padded chunk_id is deterministic for a fixed input
    # listing AND keeps consecutive chunks in one task, which is what
    # the reuse ratio-guard wants (neighboring chunks share vocabulary).
    files_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["chunk_id", "files"]),
        "chunk_id string, files string",
    ).repartitionByRange(par, "chunk_id")
    fn = make_direct_encode_fn(table_dir, key_cols, overrides, resume,
                               bloom_cols)
    entries_df = files_df.mapInArrow(
        fn, "chunk_id string, entry_json string"
    )
    schema_ddl = spark.read.parquet(files[0]).schema.json()
    extra = {"mode": "direct", "key_cols": list(key_cols)}
    if distributed_commit is None:
        distributed_commit = len(groups) >= DISTRIBUTED_MANIFEST_MIN_CHUNKS
    if distributed_commit:
        refs = _write_shards_distributed(entries_df, table_dir)
        if append:
            snapshot = _commit_append_distributed(
                spark, table_dir, refs, schema_ddl=schema_ddl, extra=extra,
            )
        else:
            snapshot = manifest.commit_shards(
                table_dir, refs, schema_ddl=schema_ddl, extra=extra,
            )
        return {
            "snapshot_id": snapshot,
            "n_chunks": sum(r["n_chunks"] for r in refs),
            "n_rows": sum(r["n_rows"] for r in refs),
            "raw_bytes": sum(r["raw_bytes"] for r in refs),
            "enc_bytes": sum(r["enc_bytes"] for r in refs),
            "reused_chunks": sum(r["reused_chunks"] for r in refs),
        }
    entries = [json.loads(r.entry_json) for r in entries_df.collect()]
    snapshot = manifest.commit(
        table_dir, entries, schema_ddl=schema_ddl, extra=extra,
        append=append,
    )
    return {
        "snapshot_id": snapshot,
        "n_chunks": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "raw_bytes": sum(e["raw_bytes"] for e in entries),
        "enc_bytes": sum(e["enc_bytes"] for e in entries),
        "reused_chunks": sum(1 for e in entries if e.get("reused")),
    }


def _manifest_files_df(spark, table_dir: str, refs: dict,
                       predicates: dict | None) -> DataFrame:
    """Distributed manifest scan: one task per shard file parses its
    entries, applies the EXACT driver pruning logic (prune_entries —
    JSON-typed stat compares + blooms, conservative on incomparable
    stats) and the chunk-layout gate, and emits the surviving
    (file, chunk_id, data_crc, enc_bytes) rows. The driver never sees
    a chunk entry."""
    import os

    shard_files = [os.path.join(table_dir, r["file"])
                   for r in refs["manifest_shards"]]
    par = min(len(shard_files),
              spark.sparkContext.defaultParallelism) or 1
    sdf = spark.createDataFrame(
        pd.DataFrame({"shard_file": shard_files}), "shard_file string"
    ).repartition(par)

    def parse_shards(pdfs):
        import json as _json

        from . import manifest as M
        from .decode import prune_entries as _prune

        for pdf in pdfs:
            files, cids, crcs, encs = [], [], [], []
            for sf in pdf["shard_file"]:
                with open(sf) as f:
                    entries = _json.load(f)["entries"]
                M.check_chunk_layout(entries)
                for e in _prune(entries, predicates):
                    files.append(os.path.join(table_dir, e["file"]))
                    cids.append(e["chunk_id"])
                    crcs.append(e.get("data_crc"))
                    encs.append(e.get("enc_bytes"))
            yield pd.DataFrame({
                "file": files, "chunk_id": cids,
                "data_crc": pd.array(crcs, dtype="Int64"),
                "enc_bytes": pd.array(encs, dtype="Int64"),
            })

    return sdf.mapInPandas(
        parse_shards,
        "file string, chunk_id string, data_crc long, enc_bytes long",
    )


def _decode_entries_df(spark, table_dir, entries, schema) -> DataFrame:
    """Decode a specific entry subset (internal: delete/upsert/compact)."""
    import os

    manifest.check_chunk_layout(entries)
    files = [os.path.join(table_dir, e["file"]) for e in entries]
    par = min(len(files), spark.sparkContext.defaultParallelism)
    files_df = spark.createDataFrame(
        pd.DataFrame({"file": files}), "file string"
    ).repartition(par)
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        column_types = {f.name: f.type for f in to_arrow_schema(schema)}
    except Exception:
        column_types = {}
    cols = [f.name for f in schema.fields]
    return files_df.mapInArrow(
        make_decode_fn(cols, column_types=column_types), schema
    )


def _predicate_cond(predicates: dict):
    """{col: (lo, hi) | point} → Spark boolean Column (AND of ranges)."""
    from .decode import normalize_predicate

    cond = None
    for col, p in predicates.items():
        lo, hi, point = normalize_predicate(p)
        c = None
        if point is not None:
            c = F.col(col) == F.lit(point)
        else:
            if lo is not None:
                c = F.col(col) >= F.lit(lo)
            if hi is not None:
                ch = F.col(col) <= F.lit(hi)
                c = ch if c is None else c & ch
        if c is not None:
            cond = c if cond is None else cond & c
    return cond if cond is not None else F.lit(True)


@_inflight_guard(1)
def delete_rows(spark: SparkSession, table_dir: str,
                predicates: dict) -> dict:
    """Row-level delete (Iceberg delete-with-rewrite parity): chunks
    whose stats overlap the predicate are decoded, surviving rows
    re-encoded under a fresh namespace, and ONE snapshot commits
    keep + rewritten — untouched chunks (the overwhelming majority at
    scale, thanks to manifest pruning) are not read at all."""
    import os

    listing = manifest.load(table_dir)
    if listing is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    affected = prune_entries(listing["entries"], predicates)
    affected_ids = {e["chunk_id"] for e in affected}
    keep = [e for e in listing["entries"]
            if e["chunk_id"] not in affected_ids]
    if not affected:
        return {"snapshot_id": listing["snapshot_id"],
                "rewritten_chunks": 0, "untouched_chunks": len(keep),
                "n_chunks": len(keep)}
    schema = StructType(_udf_safe_fields(
        [StructField(f.name, f.dataType, True, f.metadata)
         for f in StructType.fromJson(json.loads(listing["schema_ddl"])).fields]
    )[0])
    decoded = _decode_entries_df(spark, table_dir, affected, schema)
    # NULL predicate values are "unknown" → NOT deleted (keep the row)
    remaining = decoded.filter(
        ~F.coalesce(_predicate_cond(predicates), F.lit(False))
    )
    key_cols = tuple(listing["extra"].get("key_cols")
                     or ["conv_id", "turn_idx"])
    prefix = f"d{listing['snapshot_id'] + 1:04d}-"
    n_rows = sum(e["n_rows"] for e in affected)
    new_entries, _ = _encode_entries(
        remaining, table_dir, key_cols=key_cols,
        num_chunks=max(1, math.ceil(n_rows / DEFAULT_ROWS_PER_CHUNK)),
        rows_per_chunk=DEFAULT_ROWS_PER_CHUNK,
        salt_block=DEFAULT_SALT_BLOCK, overrides=None, resume=False,
        chunk_expr=None, chunk_prefix=prefix, bloom_cols=(), shuffle=True,
    )
    snap = manifest.commit(
        table_dir, keep + new_entries, schema_ddl=listing["schema_ddl"],
        extra={**listing["extra"],
               "deleted_from": sorted(affected_ids)},
    )
    for e in affected:
        try:
            os.unlink(os.path.join(table_dir, e["file"]))
        except OSError:
            pass
    return {
        "snapshot_id": snap,
        "rewritten_chunks": len(affected),
        "untouched_chunks": len(keep),
        "n_chunks": len(keep) + len(new_entries),
    }


@_inflight_guard(1)
def upsert_table(spark: SparkSession, table_dir: str,
                 df: DataFrame) -> dict:
    """Key-based upsert (the corrected-transcript case): rows in ``df``
    replace same-key rows; new keys append. Hash chunking is
    deterministic, so each upserted key maps to exactly one chunk id —
    only those chunks are decoded, merged (anti-join on the key) and
    re-encoded under their SAME ids; the append-mode commit swaps them
    in. Untouched chunks: zero I/O. Requires a hash-chunked table
    (default write mode). Historical snapshots referencing a replaced
    chunk fail loudly on read (data_crc verify), as with compaction."""
    listing = manifest.load(table_dir)
    if listing is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    extra = listing["extra"]
    if "num_chunks" not in extra:
        raise ValueError("upsert requires a hash-chunked table")
    # prefixed chunk ids (streaming appends, compaction namespaces) may
    # hold the same keys outside the hash mapping — an upsert would
    # then leave duplicates. Compact to a uniform namespace first.
    prefixed = [e["chunk_id"] for e in listing["entries"]
                if not e["chunk_id"].isdigit()]
    if prefixed:
        raise ValueError(
            "upsert requires a uniformly hash-chunked table; found "
            f"prefixed chunks (e.g. {prefixed[0]!r}) — run compact() "
            "or rewrite first"
        )
    num_chunks = extra["num_chunks"]
    salt_block = extra.get("salt_block", DEFAULT_SALT_BLOCK)
    key_cols = tuple(extra.get("key_cols") or ["conv_id", "turn_idx"])

    salt = (
        F.floor(F.col(key_cols[1]) / F.lit(salt_block))
        if len(key_cols) > 1
        else F.lit(0)
    )
    ck = F.pmod(F.xxhash64(F.col(key_cols[0]), salt), F.lit(num_chunks))
    touched_df = df.select(ck.alias("_ck")).distinct()
    n_touched = touched_df.count()
    if n_touched > UPSERT_MAX_TOUCHED_CHUNKS:
        raise ValueError(
            f"upsert touches {n_touched} chunks "
            f"(> UPSERT_MAX_TOUCHED_CHUNKS={UPSERT_MAX_TOUCHED_CHUNKS}): "
            "that is effectively a full-table rewrite whose touched-chunk "
            "set no longer fits the O(batch) driver contract — re-encode "
            "with write_table() (distributed commit) or compact() instead, "
            "or raise UPSERT_MAX_TOUCHED_CHUNKS explicitly"
        )
    touched = {f"{r[0]:06d}" for r in touched_df.collect()}
    affected = [e for e in listing["entries"] if e["chunk_id"] in touched]
    # interval columns merge in their lowered int form (both the stored
    # chunks and the incoming batch), original DDL stays in the commit
    df, _ = _lower_interval_df(df)
    schema = StructType(_udf_safe_fields(
        [StructField(f.name, f.dataType, True, f.metadata)
         for f in StructType.fromJson(json.loads(listing["schema_ddl"])).fields]
    )[0])
    old = (
        _decode_entries_df(spark, table_dir, affected, schema)
        if affected else spark.createDataFrame([], schema)
    )
    merged = old.join(df.select(*old.columns), on=list(key_cols),
                      how="left_anti").unionByName(df.select(*old.columns))
    new_entries, _ = _encode_entries(
        merged, table_dir, key_cols=key_cols, num_chunks=num_chunks,
        rows_per_chunk=DEFAULT_ROWS_PER_CHUNK, salt_block=salt_block,
        overrides=None, resume=False, chunk_expr=None, chunk_prefix="",
        bloom_cols=(), shuffle=True,
    )
    snap = manifest.commit(
        table_dir, new_entries, schema_ddl=listing["schema_ddl"],
        extra=extra, append=True,
    )
    return {
        "snapshot_id": snap,
        "rewritten_chunks": len(affected),
        "new_chunks": len(new_entries) - len(affected),
        "upserted_rows": df.count(),
    }


def search_text(
    spark: SparkSession,
    table_dir: str,
    column: str,
    token: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Full-text point lookup: chunks whose token bloom cannot contain
    ``token`` are skipped (per-chunk inverted-index sketch, built with
    ``write_table(token_bloom_cols=(column,))``); survivors decode and
    the exact whitespace-token match filters residually. At the
    10^12-turn frame this turns "find conversations mentioning X" into
    a handful of chunk decodes instead of a corpus scan."""
    from .kernels.bloom import bloom_contains

    refs = manifest.load_refs(table_dir)
    if refs is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    schema = StructType.fromJson(json.loads(refs["schema_ddl"]))
    sel = columns or [f.name for f in schema.fields]
    # interval-bearing columns decode in their lowered form and are
    # restored after the residual filter (same contract as read_table)
    sub_fields, iv_restore = _udf_safe_fields(
        [StructField(f.name, f.dataType, True, f.metadata)
         for f in schema.fields if f.name in set(sel + [column])]
    )
    sub = StructType(sub_fields)
    if (refs.get("manifest_shards") is not None
            and refs.get("n_chunks", 0) >= DISTRIBUTED_MANIFEST_MIN_CHUNKS):
        # distributed: token-bloom check runs in the shard-scan tasks
        import os

        shard_files = [os.path.join(table_dir, r["file"])
                       for r in refs["manifest_shards"]]
        par = min(len(shard_files),
                  spark.sparkContext.defaultParallelism) or 1
        sdf = spark.createDataFrame(
            pd.DataFrame({"shard_file": shard_files}), "shard_file string"
        ).repartition(par)

        def bloom_scan(pdfs):
            import json as _json

            from . import manifest as M
            from .kernels.bloom import bloom_contains as _bc

            for pdf in pdfs:
                files = []
                for sf in pdf["shard_file"]:
                    with open(sf) as f:
                        entries = _json.load(f)["entries"]
                    M.check_chunk_layout(entries)
                    for e in entries:
                        tb = e["columns"].get(column, {}) \
                            .get("token_bloom")
                        if tb is None or _bc(tb, token):
                            files.append(
                                os.path.join(table_dir, e["file"])
                            )
                yield pd.DataFrame({"file": files})

        files_df = sdf.mapInPandas(bloom_scan, "file string") \
            .repartition(spark.sparkContext.defaultParallelism)
        from .decode import make_decode_fn

        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            column_types = {f.name: f.type for f in to_arrow_schema(sub)}
        except Exception:
            column_types = {}
        cols = [f.name for f in sub.fields]
        decoded = files_df.mapInArrow(
            make_decode_fn(cols, column_types=column_types), sub
        )
    else:
        listing = manifest.load(table_dir)
        kept = []
        for e in listing["entries"]:
            tb = e["columns"].get(column, {}).get("token_bloom")
            if tb is None or bloom_contains(tb, token):
                kept.append(e)
        if not kept:
            return spark.createDataFrame([], sub).select(
                [iv_restore.get(c, F.col(f"`{c}`")) for c in sel])
        decoded = _decode_entries_df(spark, table_dir, kept, sub)
    return decoded.filter(
        F.array_contains(F.split(F.col(column), " "), token)
    ).select([iv_restore.get(c, F.col(f"`{c}`")) for c in sel])


def _accumulate_column_stats(entries: list[dict], column: str) -> dict:
    n = nulls = 0
    mn = mx = total = None
    have_all_sums = True
    for e in entries:
        m = e["columns"].get(column)
        if m is None:  # schema evolution: column absent → all null
            n += e["n_rows"]
            nulls += e["n_rows"]
            continue
        n += m["n"]
        nulls += m["nulls"]
        if m.get("min") is not None:
            mn = m["min"] if mn is None else min(mn, m["min"])
        if m.get("max") is not None:
            mx = m["max"] if mx is None else max(mx, m["max"])
        if m.get("sum") is not None:
            total = m["sum"] if total is None else total + m["sum"]
        elif m["n"] > m["nulls"]:
            have_all_sums = False
    return {"count": n, "null_count": nulls, "min": mn, "max": mx,
            "sum": total, "have_all_sums": have_all_sums}


def _merge_column_stats(parts: list[dict]) -> dict:
    out = {"count": 0, "null_count": 0, "min": None, "max": None,
           "sum": None, "have_all_sums": True}
    for p in parts:
        out["count"] += p["count"]
        out["null_count"] += p["null_count"]
        for k, pick in (("min", min), ("max", max)):
            if p[k] is not None:
                out[k] = p[k] if out[k] is None else pick(out[k], p[k])
        if p["sum"] is not None:
            out["sum"] = (p["sum"] if out["sum"] is None
                          else out["sum"] + p["sum"])
        out["have_all_sums"] &= p["have_all_sums"]
    return out


def column_stats(table_dir: str, column: str,
                 snapshot_id: int | None = None,
                 spark: SparkSession | None = None) -> dict:
    """Aggregate pushdown from the manifest alone — count / null_count
    / min / max / sum (numerics) without touching a chunk file, the
    way Parquet readers answer these from RowGroup statistics. Returns
    None fields when a chunk lacks the stat (conservative).

    Pass ``spark`` to compute shard partials in executor tasks above
    DISTRIBUTED_MANIFEST_MIN_CHUNKS — the driver then merges O(shards)
    partials instead of walking every entry."""
    refs = manifest.load_refs(table_dir, snapshot_id=snapshot_id)
    if refs is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if (spark is not None
            and refs.get("manifest_shards") is not None
            and refs.get("n_chunks", 0) >= DISTRIBUTED_MANIFEST_MIN_CHUNKS):
        import os

        shard_files = [os.path.join(table_dir, r["file"])
                       for r in refs["manifest_shards"]]
        par = min(len(shard_files),
                  spark.sparkContext.defaultParallelism) or 1
        sdf = spark.createDataFrame(
            pd.DataFrame({"shard_file": shard_files}), "shard_file string"
        ).repartition(par)

        def shard_stats(pdfs):
            import json as _json

            for pdf in pdfs:
                outs = []
                for sf in pdf["shard_file"]:
                    with open(sf) as f:
                        entries = _json.load(f)["entries"]
                    outs.append(_json.dumps(
                        _accumulate_column_stats(entries, column)
                    ))
                yield pd.DataFrame({"part": outs})

        parts = [json.loads(r.part)
                 for r in sdf.mapInPandas(shard_stats,
                                          "part string").collect()]
        st = _merge_column_stats(parts)
    else:
        listing = manifest.load(table_dir, snapshot_id=snapshot_id)
        st = _accumulate_column_stats(listing["entries"], column)
    return {
        "count": st["count"],
        "null_count": st["null_count"],
        "min": st["min"],
        "max": st["max"],
        "sum": st["sum"] if st["have_all_sums"] else None,
    }


def count_rows(table_dir: str, snapshot_id: int | None = None) -> int:
    """Exact row count straight from the snapshot LISTING — no Spark
    job, no chunk I/O, and no per-entry materialization either (the
    commit already totalled n_rows; Parquet readers do the same from
    RowGroup.num_rows)."""
    refs = manifest.load_refs(table_dir, snapshot_id=snapshot_id)
    if refs is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return refs["n_rows"]


def verify_roundtrip(source: DataFrame, decoded: DataFrame,
                     key_cols: tuple[str, ...]) -> dict:
    """Bit-identity check: decoded ⋈ source must match exactly
    (set-equality via exceptAll both directions — north_rule invariant)."""
    cols = source.columns
    d = decoded.select(*cols)
    missing = d.exceptAll(source).count()
    extra = source.exceptAll(d).count()
    return {
        "identical": missing == 0 and extra == 0,
        "rows_only_in_decoded": missing,
        "rows_only_in_source": extra,
    }
