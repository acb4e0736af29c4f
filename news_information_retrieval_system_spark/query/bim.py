"""Binary Independence Model (RSJ), with and without relevance feedback.

Reference: src/ir/retrieval/bim.py:141-260 — RSV(D) = Σ over query terms
present in D of ``ln((N - df + 0.5)/(df + 0.5))``; binary features (tf
ignored); query terms deduplicated. Feedback variant (bim.py:209-284):
pi = (ri + 0.5)/(R + 1), qi = (df - ri + 0.5)/(N - R + 1),
w = ln(pi(1-qi)/((1-pi)qi)), falling back to IDF when qi ≤ 0 or pi ≥ 1.
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


def score_bim_feedback(
    index: FulltextIndex, qterms: DataFrame, relevant: DataFrame
) -> DataFrame:
    """RSJ weights from a relevance-feedback set (bim.py:209-284).
    ``relevant``: DataFrame of (doc_id) judged-relevant docs (shared across
    queries, like the reference's set_relevance_feedback). ri = relevant
    docs containing the term — a postings semi-join + count, never a
    driver-side vocabulary loop."""
    q = qterms.select("query_id", "term").distinct()
    r_tot = relevant.agg(F.count("*").cast("double").alias("r_tot"))
    ri = (
        index.postings.join(F.broadcast(relevant.select("doc_id")), "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("ri"))
    )
    pi = (F.coalesce(F.col("ri"), F.lit(0.0)) + 0.5) / (F.col("r_tot") + 1.0)
    qi = (F.col("df") - F.coalesce(F.col("ri"), F.lit(0.0)) + 0.5) / (
        F.col("n_docs") - F.col("r_tot") + 1.0
    )
    idf_fallback = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = (
        index.term_stats.join(F.broadcast(q), "term")
        .join(F.broadcast(index.stats), how="cross")
        .join(F.broadcast(r_tot), how="cross")
        .join(ri, "term", "left")
        .withColumn(
            "w",
            F.when(
                (qi > 0) & (pi < 1),
                F.log((pi * (1.0 - qi)) / ((1.0 - pi) * qi)),
            ).otherwise(idf_fallback),
        )
        .select("query_id", "term", "w")
    )
    return (
        index.postings.join(F.broadcast(w), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
