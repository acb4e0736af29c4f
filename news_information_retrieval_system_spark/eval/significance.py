"""Paired significance testing + PR curves between two ranked runs.

The reference's evaluator names "Statistical testing (paired t-test,
Wilcoxon)" and "Threshold tuning (Precision-Recall curves)" as its
system-comparison use cases (src/ir/eval/metrics.py:62-67) but leaves the
tests to the caller; here both are first-class DataFrame transformations
over the per-query metric frames that ``eval.metrics.per_query_metrics``
already produces, so an A/B between two rankers is one extra job.

Determinism contract: per-query metric values are quantized to
``scale`` decimal steps (default 1e5 — the repo-wide ``*_5dp`` fixed
point) BEFORE any statistic is computed, so the paired deltas are exact
integers and every downstream float expression is the same IEEE-double
expression tree on Spark and on the DuckDB oracle. Outputs are rounded
back to the 5dp fixed point; the Wilcoxon rank sums are emitted as
``*_x2`` (doubled) exact integers because midrank averaging over ties
yields halves.

Scale shape: one inner join on query_id (broadcast — a metric frame has
one row per query), then single-pass global aggregates; the Wilcoxon
midranks use one window over the nonzero deltas. No UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 100_000  # repo-wide 5dp fixed point


def paired_deltas(
    metrics_a: DataFrame,
    metrics_b: DataFrame,
    metric_col: str,
    query_col: str = "query_id",
    scale: int = SCALE,
) -> DataFrame:
    """→ (query_id, a5, b5, d) with a5/b5 the quantized per-query metric
    (``round(metric * scale)`` as BIGINT) and d = a5 - b5 the exact
    integer paired delta. Queries missing from either run are dropped
    (paired tests are defined on the intersection)."""
    qa = metrics_a.select(
        F.col(query_col).alias("query_id"),
        F.round(F.col(metric_col) * scale).cast("long").alias("a5"),
    )
    qb = metrics_b.select(
        F.col(query_col).alias("query_id"),
        F.round(F.col(metric_col) * scale).cast("long").alias("b5"),
    )
    return qa.join(qb, "query_id").withColumn("d", F.col("a5") - F.col("b5"))


def paired_sig_test(
    metrics_a: DataFrame,
    metrics_b: DataFrame,
    metric_col: str,
    query_col: str = "query_id",
    scale: int = SCALE,
) -> DataFrame:
    """Paired t-test + Wilcoxon signed-rank + sign counts, one output row:

    (n_queries, wins, losses, ties, mean_a_5dp, mean_b_5dp,
     mean_delta_5dp, t_stat_5dp, n_nonzero, w_plus_x2, w_minus_x2,
     wilcoxon_z_5dp)

    * t = mean(d) / (sd(d) / sqrt(n)) with the sample sd (ddof=1),
      computed from exact integer sums so both engines evaluate the
      identical double expression; NULL when n < 2 or sd = 0.
    * Wilcoxon signed-rank over the nonzero deltas with midrank tie
      handling (average rank of |d| ties); w_plus/w_minus are emitted
      doubled (midranks are halves) as exact integers. z uses the
      normal approximation z = (W+ - n'(n'+1)/4) / sqrt(n'(n'+1)(2n'+1)/24),
      NULL when n' = 0.
    * wins/losses/ties count d > 0 / d < 0 / d = 0 at the quantized scale.
    """
    d = paired_deltas(metrics_a, metrics_b, metric_col, query_col, scale)

    nz = d.filter(F.col("d") != 0)
    # midrank of |d|: rank() gives the tie group's min position, the
    # group count closes the average — (2*min + cnt - 1) is 2*midrank
    w_ord = Window.orderBy(F.abs(F.col("d")))
    w_tie = Window.partitionBy(F.abs(F.col("d")))
    nz = nz.withColumn("min_rk", F.rank().over(w_ord)).withColumn(
        "rk_x2", 2 * F.col("min_rk") + F.count("*").over(w_tie) - 1
    )
    wil = nz.agg(
        F.count("*").cast("long").alias("n_nonzero"),
        F.coalesce(
            F.sum(F.when(F.col("d") > 0, F.col("rk_x2"))), F.lit(0)
        ).cast("long").alias("w_plus_x2"),
        F.coalesce(
            F.sum(F.when(F.col("d") < 0, F.col("rk_x2"))), F.lit(0)
        ).cast("long").alias("w_minus_x2"),
    )

    base = d.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum((F.col("d") > 0).cast("long")).alias("wins"),
        F.sum((F.col("d") < 0).cast("long")).alias("losses"),
        F.sum((F.col("d") == 0).cast("long")).alias("ties"),
        F.sum("a5").alias("sa"),
        F.sum("b5").alias("sb"),
        F.sum("d").alias("sd_sum"),
        F.sum(F.col("d") * F.col("d")).alias("sd2"),
    )

    n = F.col("n_queries").cast("double")
    mean_d = F.col("sd_sum") / n  # in quantized units
    var_d = F.when(
        F.col("n_queries") > 1,
        (F.col("sd2") - F.col("sd_sum") * F.col("sd_sum") / n) / (n - 1.0),
    )
    t_stat = F.when(var_d > 0, mean_d / F.sqrt(var_d / n))

    npz = F.col("n_nonzero").cast("double")
    mu_w = npz * (npz + 1.0) / 4.0
    sig_w = F.sqrt(npz * (npz + 1.0) * (2.0 * npz + 1.0) / 24.0)
    z = F.when(
        F.col("n_nonzero") > 0, (F.col("w_plus_x2") / 2.0 - mu_w) / sig_w
    )

    def _5dp(col, name):
        return F.round(col * SCALE).cast("long").alias(name)

    return base.crossJoin(wil).select(
        "n_queries",
        "wins",
        "losses",
        "ties",
        # sums of quantized values / n: already in 5dp units, round to int
        F.round(F.col("sa") / n).cast("long").alias("mean_a_5dp"),
        F.round(F.col("sb") / n).cast("long").alias("mean_b_5dp"),
        F.round(mean_d).cast("long").alias("mean_delta_5dp"),
        _5dp(t_stat, "t_stat_5dp"),
        "n_nonzero",
        "w_plus_x2",
        "w_minus_x2",
        _5dp(z, "wilcoxon_z_5dp"),
    )


def interpolated_pr(
    ranked: DataFrame,
    qrels: DataFrame,
    levels: int = 11,
    scale: int = SCALE,
) -> DataFrame:
    """11-point interpolated precision-recall curve per query →
    (query_id, recall_pct, p_interp_5dp), recall_pct ∈ {0,10,…,100}.

    p_interp(r) = max over ranks i with recall(i) ≥ r of precision(i)
    (the TREC convention); 0.0 when the run never reaches recall r
    inside the retrieved list. Max precision at recall ≥ r is always
    attained at a hit rank, but the max is taken over all ranks — same
    answer, simpler plan. One ranked×qrels join, one window, one
    broadcast join against the constant level table.
    """
    totals = qrels.filter(F.col("rel") > 0).groupBy("query_id").agg(
        F.count("*").alias("n_rel")
    )
    j = (
        ranked.join(
            qrels.filter(F.col("rel") > 0).select(
                "query_id", "doc_id", F.lit(1).alias("is_hit")
            ),
            ["query_id", "doc_id"],
            "left",
        )
        .fillna({"is_hit": 0})
        .join(F.broadcast(totals), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    j = (
        j.withColumn("cum_hits", F.sum("is_hit").over(w))
        .withColumn("prec", F.col("cum_hits") / F.col("rank"))
        .withColumn("recall", F.col("cum_hits") / F.col("n_rel"))
    )
    spark = ranked.sparkSession
    step = 100 // (levels - 1)
    lv = spark.range(levels).select(
        (F.col("id") * step).cast("int").alias("recall_pct")
    )
    # grid is tiny (11 rows) — broadcast the levels against per-rank rows
    out = (
        j.crossJoin(F.broadcast(lv))
        .filter(F.col("recall") * 100 >= F.col("recall_pct"))
        .groupBy("query_id", "recall_pct")
        .agg(F.max("prec").alias("p_interp"))
    )
    # levels never reached → 0.0: rebuild the full grid per query
    grid = totals.select("query_id").crossJoin(F.broadcast(lv))
    return (
        grid.join(out, ["query_id", "recall_pct"], "left")
        .fillna({"p_interp": 0.0})
        .select(
            "query_id",
            "recall_pct",
            F.round(F.col("p_interp") * scale).cast("long").alias("p_interp_5dp"),
        )
    )
