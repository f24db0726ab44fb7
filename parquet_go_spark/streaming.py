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

__all__ = ["encode_stream", "windowed_stats_stream", "sessionize_stream"]


def sessionize_stream(
    stream_df: DataFrame,
    gap_minutes: int = 30,
    query_name: str = "stream_sessions",
):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user gap-based session assignment where the state (last event
    time + running session index) survives across micro-batches — the
    streaming twin of pipeline.sessionize. The per-group kernel is
    vectorized numpy over the batch's events; state is two scalars per
    user, which is what keeps the state store bounded at the
    10¹²-event frame (plus a processing-time timeout to evict idle
    users in production).

    Emits one row per event (user_id, event_id, session_idx) to a
    memory sink in append mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def assign(key, pdfs, state):
        import numpy as np
        import pandas as pd

        last_us, sess = state.get if state.exists else (None, 0)
        gap_us = gap_minutes * 60 * 1_000_000
        # a group's rows can arrive SPLIT ACROSS pandas chunks that
        # interleave in event time — materialize the whole micro-batch
        # for this group (already bounded by batch size) and sort ONCE,
        # else gaps are computed against the wrong predecessor
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns → µs
            prev = np.empty(len(us), dtype=np.int64)
            prev[0] = last_us if last_us is not None else np.iinfo(np.int64).min
            prev[1:] = us[:-1]
            # min-sentinel makes the first-ever event open session 1
            new = (us - prev > gap_us) | (prev == np.iinfo(np.int64).min)
            sess_idx = sess + np.cumsum(new.astype(np.int64))
            last_us, sess = int(us[-1]), int(sess_idx[-1])
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "session_idx": sess_idx,
                }
            )
        state.update((last_us if last_us is not None else 0, sess))

    sessions = stream_df.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType="user_id long, event_id long, session_idx long",
        stateStructType="last_us long, sess long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_stats_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_stats",
    output_mode: str = "complete",
):
    """Event-time windowed aggregation over a stream (SURVEY §2.8
    streaming row): tumbling windows on the event timestamp with a
    watermark bounding state for late data. Exact integer aggregates
    (count + sum of event ids) so the result is oracle-comparable.

    ``output_mode='complete'`` re-emits all windows each trigger (the
    harness default — every window is visible even while open).
    ``output_mode='append'`` is the production/state-bounded path: a
    window row is emitted exactly once, when the watermark passes its
    close — finalized windows leave the state store, which is what
    bounds state at the 10¹²-event frame; windows still within
    ``watermark`` of the stream's max event time remain open (not yet
    emitted)."""
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
        .outputMode(output_mode)
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
