"""IR evaluation metrics as DataFrame transformations.

Reference formulas (src/ir/eval/metrics.py:84-1022): P@k, R@k, F_β (:146),
AP/MAP, RR/MRR, DCG/nDCG@k with gain ``(2^rel - 1) / log2(i + 1)``
(:413-520), ERR@k cascade model (:521), GMAP (:581), RBP (:635), bpref
(:718), R-precision (:780), success@k (:810). Inputs: ``ranked(query_id,
doc_id, rank)`` (rank 1-based, unique per query) and ``qrels(query_id,
doc_id, rel)`` (graded, rel ≥ 0).

List-truncation semantics mirror the reference exactly: AP (:246), RR,
bpref (:718) and R-precision (:780) evaluate the FULL retrieved list,
while P@k/R@k/F1/nDCG@k/ERR@k/RBP/success@k truncate at ``k``. Both are
computed in ONE pipeline — a single ranked×qrels join with rank windows
over the full list, @k metrics gated per row by ``rank <= k`` instead of
a pre-filter — so the untruncated semantics cost no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ERR_MAX_GRADE = 3.0  # reference expected_reciprocal_rank default
RBP_P = 0.8  # reference rank_biased_precision persistence
GMAP_EPS = 1e-10  # reference geometric_mean_average_precision epsilon


def per_query_metrics(ranked: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """→ (query_id, p_at_k, r_at_k, f1, ap, rr, ndcg, err, rbp, bpref,
    r_prec, success) — one row per query that has at least one qrel
    judgment. ERR uses the cascade model with max_grade=3 (metrics.py:521),
    grades clamped to the 0-3 scale (the raw formula's log(1-R) is
    undefined above it — the reference would raise; we saturate); RBP is
    binary with p=0.8 (:635); bpref counts judged-nonrelevant =
    retrieved-but-unjudged, the reference default (:718); R-precision
    evaluates the list as given when it is shorter than R (:780)."""
    totals = qrels.filter(F.col("rel") > 0).groupBy("query_id").agg(
        F.count("*").alias("n_rel")
    )
    j = (
        ranked.join(qrels, ["query_id", "doc_id"], "left")
        .fillna({"rel": 0})
        .join(F.broadcast(totals), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    at_k = (F.col("rank") <= k).cast("int")
    j = j.withColumn("is_hit", (F.col("rel") > 0).cast("int"))
    j = j.withColumn("cum_hits", F.sum("is_hit").over(w))
    j = j.withColumn("prec_at_i", F.col("cum_hits") / F.col("rank"))
    j = j.withColumn(
        "dcg_term",
        (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0),
    )
    # ERR cascade: R(r) = (2^rel - 1)/2^max_grade with rel clamped to the
    # 0..max_grade scale; the Π(1-R(i)) prefix product becomes
    # exp(Σ ln(1-R)) over the strictly-preceding window
    rel_c = F.least(F.col("rel").cast("double"), F.lit(ERR_MAX_GRADE))
    j = j.withColumn(
        "_errR",
        (F.pow(F.lit(2.0), rel_c) - 1.0) / F.pow(F.lit(2.0), F.lit(ERR_MAX_GRADE)),
    )
    j = j.withColumn(
        "_err_cont",
        F.exp(F.coalesce(F.sum(F.log(1.0 - F.col("_errR"))).over(wprev), F.lit(0.0))),
    )
    j = j.withColumn("err_term", F.col("_errR") * F.col("_err_cont") / F.col("rank"))
    j = j.withColumn(
        "rbp_term",
        F.lit(1.0 - RBP_P) * F.pow(F.lit(RBP_P), F.col("rank") - 1) * F.col("is_hit"),
    )
    # bpref: judged non-relevant before a hit = retrieved non-hits before it
    j = j.withColumn(
        "_nonrel_before",
        F.coalesce(F.sum(1 - F.col("is_hit")).over(wprev), F.lit(0)),
    )
    j = j.withColumn(
        "bpref_term",
        F.col("is_hit")
        * (1.0 - F.least(F.col("_nonrel_before"), F.col("n_rel")) / F.col("n_rel")),
    )
    agg = j.groupBy("query_id").agg(
        F.sum(F.col("is_hit") * at_k).alias("hits_k"),
        F.sum(F.col("prec_at_i") * F.col("is_hit")).alias("sum_prec_hits"),
        F.min(F.when(F.col("is_hit") == 1, F.col("rank"))).alias("first_hit"),
        F.sum(F.col("dcg_term") * at_k).alias("dcg"),
        F.sum(F.col("err_term") * at_k).alias("err"),
        F.sum(F.col("rbp_term") * at_k).alias("rbp"),
        F.sum("bpref_term").alias("sum_bpref"),
        F.sum(
            F.col("is_hit") * (F.col("rank") <= F.col("n_rel")).cast("int")
        ).alias("rprec_hits"),
    )
    # ideal DCG from qrels sorted by rel desc
    wi = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wi))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    p_at_k = F.col("hits_k") / F.lit(float(k))
    r_at_k = F.col("hits_k") / F.col("n_rel")
    out = (
        agg.join(totals, "query_id", "inner")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            p_at_k.alias("p_at_k"),
            r_at_k.alias("r_at_k"),
            F.when(
                p_at_k + r_at_k > 0, 2.0 * p_at_k * r_at_k / (p_at_k + r_at_k)
            )
            .otherwise(F.lit(0.0))
            .alias("f1"),
            (F.col("sum_prec_hits") / F.col("n_rel")).alias("ap"),
            F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("rr"),
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
            F.col("err").alias("err"),
            F.col("rbp").alias("rbp"),
            (F.col("sum_bpref") / F.col("n_rel")).alias("bpref"),
            (F.col("rprec_hits") / F.col("n_rel")).alias("r_prec"),
            (F.col("hits_k") > 0).cast("double").alias("success"),
        )
    )
    return out


def run_metrics(ranked: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Run-level aggregation of ``per_query_metrics``. One row with
    columns: map, mrr, mean_p_at_k, mean_r_at_k, mean_f1, mean_ndcg,
    mean_err, mean_rbp, mean_bpref, mean_r_prec, success_rate, gmap.

    GMAP = exp(mean(ln(AP + ε))), ε=1e-10 — the reference's
    geometric_mean_average_precision (metrics.py:581), which punishes
    low-AP queries far harder than MAP; success_rate = mean success@k
    (:810)."""
    pq = per_query_metrics(ranked, qrels, k)
    return pq.agg(
        F.avg("ap").alias("map"),
        F.avg("rr").alias("mrr"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("r_at_k").alias("mean_r_at_k"),
        F.avg("f1").alias("mean_f1"),
        F.avg("ndcg").alias("mean_ndcg"),
        F.avg("err").alias("mean_err"),
        F.avg("rbp").alias("mean_rbp"),
        F.avg("bpref").alias("mean_bpref"),
        F.avg("r_prec").alias("mean_r_prec"),
        F.avg("success").alias("success_rate"),
        F.exp(F.avg(F.log(F.col("ap") + GMAP_EPS))).alias("gmap"),
    )
