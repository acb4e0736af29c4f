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


def _minmax_norm():
    """Per-query min-max normalized score column; 1.0 when max==min
    (reference hybrid.py:241-270 'minmax')."""
    wnorm = Window.partitionBy("query_id")
    mx, mn = F.max("score").over(wnorm), F.min("score").over(wnorm)
    return F.when(mx == mn, F.lit(1.0)).otherwise((F.col("score") - mn) / (mx - mn))


def _zscore_norm():
    """Per-query z-score normalized score column; 0.0 when std==0
    (reference hybrid.py:271-283 'zscore'; population std like np.std)."""
    wnorm = Window.partitionBy("query_id")
    mean = F.avg("score").over(wnorm)
    std = F.stddev_pop("score").over(wnorm)
    return F.when(std == 0.0, F.lit(0.0)).otherwise((F.col("score") - mean) / std)


def linear_fuse(
    scorings: Sequence[tuple[DataFrame, float]],
) -> DataFrame:
    """Weighted CombSUM with per-query min-max normalization — the
    reference's generic linear fusion mode (src/ir/ranking/hybrid.py:100-433,
    'linear' + 'minmax'). Input: [(scores(query_id, doc_id, score), weight)].
    Docs absent from one ranking contribute 0 from it (CombSUM). Degenerate
    case max==min within a query normalizes to 1.0, matching the
    reference's ``_normalize_scores`` for an all-identical list
    (src/ir/ranking/hybrid.py:241-270)."""
    parts = []
    for i, (df, w) in enumerate(scorings):
        parts.append(
            df.select(
                "query_id", "doc_id", (F.lit(w) * _minmax_norm()).alias("contrib")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))


def combmnz_fuse(
    scorings: Sequence[tuple[DataFrame, float]],
    normalization: str = "minmax",
) -> DataFrame:
    """CombMNZ: (Σ wᵢ·norm(scoreᵢ)) × |{rankers with norm(score) > 0}|
    (reference src/ir/ranking/hybrid.py:389-433; match = score > 0 after
    normalization, :412-419). ``normalization``: 'minmax' | 'zscore' |
    'none'."""
    if normalization == "minmax":
        norm = _minmax_norm()
    elif normalization == "zscore":
        norm = _zscore_norm()
    elif normalization == "none":
        norm = F.col("score")
    else:
        raise ValueError(f"unknown normalization: {normalization}")
    parts = []
    for df, w in scorings:
        parts.append(
            df.select(
                "query_id",
                "doc_id",
                norm.alias("_norm"),
            ).select(
                "query_id",
                "doc_id",
                (F.lit(w) * F.col("_norm")).alias("contrib"),
                (F.col("_norm") > 0).cast("int").alias("is_match"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("query_id", "doc_id").agg(
        (F.sum("contrib") * F.sum("is_match")).alias("score")
    )


def zscore_linear_fuse(
    scorings: Sequence[tuple[DataFrame, float]],
) -> DataFrame:
    """Weighted CombSUM under per-query z-score normalization — the
    reference's 'linear' + 'zscore' mode (src/ir/ranking/hybrid.py:271-283)."""
    parts = [
        df.select("query_id", "doc_id", (F.lit(w) * _zscore_norm()).alias("contrib"))
        for df, w in scorings
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))


def ranked(scores: DataFrame) -> DataFrame:
    """Attach deterministic rank (score desc, doc_id asc) without a limit."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scores.withColumn("rank", F.row_number().over(w))
