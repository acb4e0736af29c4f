"""Binary Independence Model (RSJ, no feedback).

Reference: src/ir/retrieval/bim.py:141-260 — RSV(D) = Σ over query terms
present in D of ``ln((N - df + 0.5)/(df + 0.5))``; binary features (tf
ignored); query terms deduplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .bm25 import topk


def score_bim(index: FulltextIndex, qterms: DataFrame) -> DataFrame:
    q = qterms.select("query_id", "term").distinct()
    w = (
        index.term_stats.join(F.broadcast(q), "term")
        .join(F.broadcast(index.stats), how="cross")
        .withColumn(
            "w",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .select("query_id", "term", "w")
    )
    return (
        index.postings.join(F.broadcast(w), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )


def bim_topk(index: FulltextIndex, qterms: DataFrame, k: int = 10) -> DataFrame:
    return topk(score_bim(index, qterms), k=k)
