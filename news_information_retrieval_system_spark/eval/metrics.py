"""IR evaluation metrics as DataFrame transformations.

Reference formulas (src/ir/eval/metrics.py:84-1022): P@k, R@k, AP/MAP,
RR/MRR, DCG/nDCG@k with gain ``(2^rel - 1) / log2(i + 1)`` (:413-520).
Inputs: ``ranked(query_id, doc_id, rank)`` (rank 1-based, unique per
query) and ``qrels(query_id, doc_id, rel)`` (graded, rel ≥ 0). All
expressible as joins + windows — one shuffle per join, one per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _joined(ranked: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    r = ranked.filter(F.col("rank") <= k)
    return r.join(qrels, ["query_id", "doc_id"], "left").fillna({"rel": 0})


def per_query_metrics(ranked: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """→ (query_id, p_at_k, r_at_k, ap, rr, ndcg) — one row per query that
    has at least one qrel judgment."""
    totals = qrels.filter(F.col("rel") > 0).groupBy("query_id").agg(
        F.count("*").alias("n_rel")
    )
    j = _joined(ranked, qrels, k)
    w = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn("is_hit", (F.col("rel") > 0).cast("int"))
    j = j.withColumn("cum_hits", F.sum("is_hit").over(w))
    j = j.withColumn("prec_at_i", F.col("cum_hits") / F.col("rank"))
    j = j.withColumn(
        "dcg_term",
        (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0),
    )
    agg = j.groupBy("query_id").agg(
        F.sum("is_hit").alias("hits"),
        F.sum(F.col("prec_at_i") * F.col("is_hit")).alias("sum_prec_hits"),
        F.min(F.when(F.col("is_hit") == 1, F.col("rank"))).alias("first_hit"),
        F.sum("dcg_term").alias("dcg"),
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
    out = (
        agg.join(totals, "query_id", "inner")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            (F.col("hits") / F.lit(float(k))).alias("p_at_k"),
            (F.col("hits") / F.col("n_rel")).alias("r_at_k"),
            (F.col("sum_prec_hits") / F.col("n_rel")).alias("ap"),
            F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("rr"),
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
    )
    return out


def run_metrics(ranked: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Run-level means: (map, mrr, mean_p_at_k, mean_r_at_k, mean_ndcg)."""
    pq = per_query_metrics(ranked, qrels, k)
    return pq.agg(
        F.avg("ap").alias("map"),
        F.avg("rr").alias("mrr"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("r_at_k").alias("mean_r_at_k"),
        F.avg("ndcg").alias("mean_ndcg"),
    )
