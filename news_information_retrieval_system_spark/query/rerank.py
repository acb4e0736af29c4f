"""Two-phase retrieve-then-rerank: candidate generation + model rescoring.

The serving composition the reference's LTR sandbox exists FOR
(learning_to_rank_feature_service.py:140-197 exports features,
learning_to_rank_training_service.py:38-122 fits the model; the product
loop applies the fitted model over each query's top results): phase 1
retrieves a candidate pool per query with cheap exhaustive BM25 — the
block-max WAND kernel produces the identical pool (rank-identity pinned
by wand_topk's gate) and is the 10^12-doc phase-1 engine — and phase 2
rescores ONLY those candidates with a linear model over the LTR feature
row and re-ranks.

Spark shape: candidates and every per-pair feature come from ONE
candidate×query-term expansion (ops/ltr.ltr_features wraps
query/diagnostics.model_term_matrix) — one postings join total; phase 2
touches k_cand·|queries| rows, never the corpus, so its cost is
independent of corpus size. Weights arrive as a plain dict (the pinned
production artifact; ``ops.ltr.ltr_train``'s coefficient frame drops in
after one collect of its ≤ |features|+1 rows) and are burned into the
plan as literals — no model object, no UDF, whole-stage codegen all the
way down.

Determinism: the rerank score rounds to 9dp before ranking, ties break
(score desc, doc_id asc, the engine-wide discipline), and the applied
model is linear over raw (unstandardized) features so an independent SQL
engine reproduces the rescore exactly from the same pinned constants.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from ..ops.ltr import ltr_features


def rerank_topk(
    index: FulltextIndex,
    qterms: DataFrame,
    weights: Mapping[str, float],
    intercept: float = 0.0,
    k_cand: int = 100,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mu: float = 2000.0,
) -> DataFrame:
    """→ (query_id, rank, doc_id, score, phase1_rank): each query's BM25
    top-``k_cand`` pool re-ranked by the pinned linear model
    ``intercept + Σ weights[f]·feature_f`` (9dp-rounded). ``weights``
    keys must be ltr_features columns (query_term_count, match_count,
    dl, bm25_score, tfidf_score, lm_score); ``phase1_rank`` is the BM25
    rank the candidate entered with — the rank-movement observable Q27's
    model-compare payload reads."""
    feats = ltr_features(
        index, qterms, k_cand=k_cand, k1=k1, b=b, mu=mu
    )
    bad = set(weights) - set(feats.columns)
    if bad:
        raise ValueError(f"unknown feature columns in weights: {sorted(bad)}")
    score = F.lit(float(intercept))
    for name in sorted(weights):
        score = score + F.lit(float(weights[name])) * F.col(name)
    scored = feats.select(
        "query_id",
        "doc_id",
        F.col("rank").alias("phase1_rank"),
        F.round(score, 9).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "phase1_rank")
    )
