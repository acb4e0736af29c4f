"""Streaming event analytics: watermarked tumbling/sliding-window rollups.

The batch face of these rollups is ``ops/feedback.py`` /
``entry_queries_batch3.q_date_range_events``; this is the continuous
face for an unbounded event stream (the engine's ingest side already
streams — streaming/ingest.py). Watermarking bounds state: windows
older than the watermark finalize, emit (append mode), and their state
is dropped, so a 100 TB/day event firehose holds only
O(active windows × event types) state per executor instead of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming (or batch) events → per-window per-type rollup:
    (window_start, window_end, event_type, n_events, total_value).

    On a streaming input the watermark declares how late events may
    arrive: later ones are dropped and their window's state is already
    released. On a batch input the same expression tree runs without
    state (Spark ignores withWatermark in batch), which is what the
    equivalence test exploits: streamed complete-mode output must equal
    the batch run on the same rows.
    """
    # event-time watermarks require TIMESTAMP (parquet often carries NTZ);
    # cast identically in batch and stream so the two plans stay comparable
    stream = stream.withColumn("_evt", F.col(ts_col).cast("timestamp"))
    win = (
        F.window("_evt", window_duration, slide)
        if slide
        else F.window("_evt", window_duration)
    )
    src = stream.withWatermark("_evt", watermark) if stream.isStreaming else stream
    return (
        src.groupBy(win.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
