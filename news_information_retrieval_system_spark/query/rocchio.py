"""Rocchio relevance-feedback query expansion.

Reference: α=1.0, β=0.75, γ=0.15, app caps max_terms=8, min_weight=0.01
(src/ir/ranking/rocchio.py:71-460, src/ir_app/services/index_service.py:390).
Q_new = α·Q + β·centroid(D_r) − γ·centroid(D_nr), clamped at 0 per term
(rocchio.py:264-275). The PRF path passes no non-relevant docs (γ term
drops); explicit feedback supplies ``neg_feedback`` and the γ subtraction
applies.

Distributed shape: each feedback centroid is an aggregation over the
feedback docs' TF-IDF vectors — a join + groupBy over postings, never a
collect of postings. Only the final expanded term list (≤ max_terms rows
per query) reaches the driver-side query structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .vsm import build_tfidf_weights


def rocchio_expand(
    index: FulltextIndex,
    qterms: DataFrame,
    feedback: DataFrame,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    neg_feedback: DataFrame | None = None,
    max_terms: int = 8,
    min_weight: float = 0.01,
    weights: DataFrame | None = None,
    rank_dp: int | None = None,
    max_drift: float | None = None,
) -> DataFrame:
    """qterms(query_id, term, qtf), feedback(query_id, doc_id) = relevant
    docs, neg_feedback(query_id, doc_id) = optional non-relevant docs.
    → expanded (query_id, term, weight): original query weights (α·idf·qtf)
    plus β·centroid of relevant vectors minus γ·centroid of non-relevant
    vectors, clamped at 0 per term (reference rocchio.py:264-275), capped
    at max_terms new terms.

    ``max_drift``: query-drift guard (reference rocchio.py:103-132,277-307;
    default 0.7 there). Drift = cosine DISTANCE between the original query
    vector and the full expanded vector, computed BEFORE term limiting;
    when drift > max_drift the expansion-term cap shrinks to
    ``max(1, int(max_terms · max_drift/drift))``. Per-query drift is one
    tiny aggregation over the merged term frame — no driver-side vectors.
    """
    if weights is None:
        weights = build_tfidf_weights(index)
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    def _centroid(fb: DataFrame, coef: float) -> DataFrame:
        sizes = fb.groupBy("query_id").agg(F.count("*").alias("n_fb"))
        return (
            weights.join(F.broadcast(fb), "doc_id")
            .groupBy("query_id", "term")
            .agg(F.sum("w_norm").alias("sum_w"))
            .join(F.broadcast(sizes), "query_id")
            .withColumn("fb_w", F.lit(coef) * F.col("sum_w") / F.col("n_fb"))
            .select("query_id", "term", "fb_w")
        )

    centroid = _centroid(feedback, beta)
    if neg_feedback is not None:
        # signed union: the γ centroid enters as a negative contribution
        # and is summed with the β centroid per (query, term)
        centroid = (
            centroid.unionByName(_centroid(neg_feedback, -gamma))
            .groupBy("query_id", "term")
            .agg(F.sum("fb_w").alias("fb_w"))
        )
    qvec = (
        index.term_stats.select("term", "idf")
        .join(F.broadcast(qterms), "term")
        .withColumn("q_w", F.lit(alpha) * F.col("qtf") * F.col("idf"))
        .select("query_id", "term", "q_w")
    )
    # γ subtraction can drive a term negative; the reference clamps the
    # expanded vector at 0 (rocchio.py:272-275) — a no-op when γ is unused
    weight_expr = F.greatest(F.lit(0.0), F.col("q_w") + F.col("fb_w"))
    if rank_dp is not None:
        # round before filter/rank so an independent re-implementation
        # (e.g. the SQL oracle) summing in a different order agrees
        weight_expr = F.round(weight_expr, rank_dp)
    full = (
        qvec.join(centroid, ["query_id", "term"], "full")
        .fillna({"q_w": 0.0, "fb_w": 0.0})
        .withColumn("weight", weight_expr)
    )
    if max_drift is not None:
        # cosine distance between (q_w over orig terms) and (weight over
        # all terms): the dot product only has support on the orig terms
        drift = full.groupBy("query_id").agg(
            F.sum(F.col("q_w") * F.col("weight")).alias("_dot"),
            F.sqrt(F.sum(F.col("q_w") * F.col("q_w"))).alias("_m1"),
            F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("_m2"),
        )
        cos = F.least(
            F.lit(1.0),
            F.greatest(F.lit(-1.0), F.col("_dot") / (F.col("_m1") * F.col("_m2"))),
        )
        drift = drift.select(
            "query_id",
            F.when(F.col("_m1") * F.col("_m2") == 0.0, F.lit(1.0))
            .otherwise(1.0 - cos)
            .alias("drift"),
        )
        eff_cap = F.when(
            F.col("drift") > max_drift,
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(max_terms)) * F.lit(max_drift) / F.col("drift")).cast("int"),
            ),
        ).otherwise(F.lit(max_terms))
        full = full.join(F.broadcast(drift), "query_id").withColumn(
            "_cap", eff_cap
        )
    else:
        full = full.withColumn("_cap", F.lit(max_terms))
    merged = full.filter(F.col("weight") >= min_weight)
    # original terms always kept; new (expansion) terms capped per query
    w = Window.partitionBy("query_id").orderBy(F.desc("weight"), F.asc("term"))
    ranked = merged.withColumn("is_orig", (F.col("q_w") > 0).cast("int")).withColumn(
        "exp_rank",
        F.sum(1 - F.col("is_orig")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return ranked.filter(
        (F.col("is_orig") == 1) | (F.col("exp_rank") <= F.col("_cap"))
    ).select("query_id", "term", "weight")
