"""Structured Streaming ingestion into the encoded-chunk table.

The reference is batch-only (SURVEY.md §2.8: streaming absent); this is
the capability a continuously-arriving transcript pipeline needs on top
of it. Spark-first: the stream is a normal ``readStream`` DataFrame and
each micro-batch goes through the SAME batch encode path
(``table.write_table``) inside ``foreachBatch`` — no separate streaming
codec.

Exactly-once: chunk ids are namespaced per micro-batch
(``b{batch_id}-``) and chunk writes are idempotent (tmp+rename, resume
reuses byte-identical committed chunks), so a replayed batch after a
failure re-commits the same chunk ids and the manifest merge
deduplicates — end-to-end exactly-once without a transaction log.

At scale: one snapshot commit per micro-batch is driver-side O(chunks)
JSON; for very long streams compact manifests periodically (rewrite the
entry list, drop superseded snapshots) exactly like Iceberg's
rewrite-manifests action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import table

__all__ = ["encode_stream", "windowed_stats_stream"]


def windowed_stats_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_stats",
):
    """Event-time windowed aggregation over a stream (SURVEY §2.8
    streaming row): tumbling windows on the event timestamp with a
    watermark bounding state for late data. Exact integer aggregates
    (count + sum of event ids) so the result is oracle-comparable.

    Complete output mode to a memory sink for the harness; in
    production swap the sink and use append mode — the watermark then
    finalizes each window ``watermark`` after its close, which is what
    bounds the state store at the 10¹²-event frame."""
    from pyspark.sql import functions as F

    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.sum("event_id").alias("sum_event_id"))
        .select(F.col("w.start").alias("w_start"), "n_events",
                "sum_event_id")
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def encode_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    chunks_per_batch: int = 8,
    trigger_available_now: bool = True,
    **write_kwargs,
):
    """Start a streaming query that encodes each micro-batch as an
    append to ``table_dir``. Returns the StreamingQuery."""

    def commit_batch(bdf: DataFrame, batch_id: int) -> None:
        if bdf.isEmpty():
            return
        table.write_table(
            bdf,
            table_dir,
            key_cols=key_cols,
            num_chunks=chunks_per_batch,
            chunk_prefix=f"b{batch_id:06d}-",
            append=True,
            **write_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
