"""Streaming exact deduplication — the continuous face of
``ops/dedup.exact_dedup`` (reference doc_reader.py:71-94 md5 content
hash), for ingest pipelines that must drop duplicate documents before
they reach the index or a training-data sink.

State story at 100 TB/day: ``dropDuplicatesWithinWatermark`` keys state
on the md5 content hash and ages entries out once the event-time
watermark passes them, so executor state holds only the hash set of the
late-arrival horizon (hours), never the full corpus history. Batch
dedup of all history stays the batch op's job; the stream guarantees
no duplicate WITHIN the horizon — the standard split for exactly-once
ingest (duplicates straddling a horizon boundary are caught by the
periodic batch compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.dedup import content_hash_col


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each content hash survives; any duplicate
    arriving within the watermark horizon is dropped. On a batch input
    the same expression tree degrades to hash-keyed dropDuplicates
    (arbitrary survivor — use ops.dedup.exact_dedup when the min-id
    survivor rule matters), which the equivalence test exploits: the
    streamed output's hash set must equal the batch-distinct hash set.
    """
    src = stream.withColumn("_evt", F.col(ts_col).cast("timestamp")).withColumn(
        "content_hash", content_hash_col(F.col(text_col))
    )
    if src.isStreaming:
        return src.withWatermark("_evt", watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return src.dropDuplicates(["content_hash"])
