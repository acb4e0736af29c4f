"""Stateless streaming curation — the continuous face of the batch
pipeline's row-local stages: quality floor → PII redaction → split
assignment. Every stage is a pure Column expression, so the SAME
transform runs unchanged over a ``readStream`` or a batch frame, and
the streamed output equals the batch output row-for-row (the
equivalence test exploits this).

Composition at 100 TB/day: this pass runs first (no state, no
watermark, arbitrarily parallel), then the stateful stages chain
behind it — ``streaming.dedup.exact_dedup_stream`` for exact dedup
within the late-arrival horizon, periodic batch ``ops/pipeline``
compaction for near-dup/decontamination (near-dup needs corpus-wide
joins no stream can hold in state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.curation import EMAIL_RE, split_col
from ..ops.textstats import quality_score_col


def curate_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    redact_pii: bool = True,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Quality-filter, PII-redact, and split-assign a document stream.
    Works identically on batch frames (same expression tree)."""
    out = stream.filter(quality_score_col(F.col(text_col)) >= min_quality)
    if redact_pii:
        out = out.withColumn(
            text_col, F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
        )
    return out.withColumn("split", split_col(id_col, train, val))
