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


def _run_stream(spark, src, tbl, ckpt, files_per_trigger=1):
    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    q = streaming.encode_stream(stream, tbl, ckpt, chunks_per_batch=4)
    q.awaitTermination(120)
    assert not q.isActive


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
    step = (t.num_rows + 2) // 3  # time-ordered micro-batches
    for i in range(0, t.num_rows, step):
        pq.write_table(t.slice(i, step), f"{src}/f{i // step}.parquet")

    schema = spark.read.parquet(src_pq).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "event_id", "ts")
    )
    q = streaming.sessionize_stream(stream, query_name="t_sess")
    q.awaitTermination(300)
    got = (
        spark.table("t_sess")
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
