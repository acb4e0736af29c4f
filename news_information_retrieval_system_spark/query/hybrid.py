"""Hybrid rank fusion.

Reference: weighted reciprocal-rank fusion of BM25 (w=0.65) and TF-IDF
(w=0.35) with rrf_k=60 and inner depth max(50, 5·top_k)
(src/ir_app/services/search_service.py:268-295); the generic module also
ships linear/combsum/combmnz (src/ir/ranking/hybrid.py:100-433).

Input rankings must carry (query_id, doc_id, rank); fusion is a union +
one groupBy — rank computation upstream already paid its shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .bm25 import bm25_topk, topk
from .vsm import tfidf_topk


def rrf_fuse(
    rankings: Sequence[tuple[DataFrame, float]], rrf_k: int = 60
) -> DataFrame:
    """[(ranked_df(query_id, doc_id, rank), weight)] → fused scores."""
    parts = [
        df.select(
            "query_id", "doc_id", (F.lit(w) / (F.lit(rrf_k) + F.col("rank"))).alias("contrib")
        )
        for df, w in rankings
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))


def hybrid_topk(
    index: FulltextIndex,
    qterms: DataFrame,
    k: int = 10,
    w_bm25: float = 0.65,
    w_tfidf: float = 0.35,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    depth = max(50, 5 * k)  # search_service.py:268-295
    r1 = bm25_topk(index, qterms, k=depth, k1=k1, b=b)
    r2 = tfidf_topk(index, qterms, k=depth)
    return topk(rrf_fuse([(r1, w_bm25), (r2, w_tfidf)], rrf_k=rrf_k), k=k)


def linear_fuse(
    scorings: Sequence[tuple[DataFrame, float]],
) -> DataFrame:
    """Weighted CombSUM with per-query min-max normalization — the
    reference's generic linear fusion mode (src/ir/ranking/hybrid.py:100-433,
    'linear' + 'minmax'). Input: [(scores(query_id, doc_id, score), weight)].
    Docs absent from one ranking contribute 0 from it (CombSUM)."""
    parts = []
    for i, (df, w) in enumerate(scorings):
        wnorm = Window.partitionBy("query_id")
        norm = (F.col("score") - F.min("score").over(wnorm)) / F.when(
            F.max("score").over(wnorm) != F.min("score").over(wnorm),
            F.max("score").over(wnorm) - F.min("score").over(wnorm),
        ).otherwise(F.lit(1.0))
        parts.append(
            df.select("query_id", "doc_id", (F.lit(w) * norm).alias("contrib"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))


def ranked(scores: DataFrame) -> DataFrame:
    """Attach deterministic rank (score desc, doc_id asc) without a limit."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scores.withColumn("rank", F.row_number().over(w))
