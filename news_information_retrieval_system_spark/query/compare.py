"""Q27 — cross-model result comparison (overlap / unique docs / rank deltas).

Reference parity: RetrievalOrchestrator._comparison_summary
(/root/reference/src/ir_app/services/retrieval_orchestrator.py:278-314):
pairwise overlap counts between each model pair's result sets, per-model
unique-document counts, and per-document rank spans across models (top 50
by span).

Spark shape: the per-model ranked frames are already tiny (top-k per
query), so every statistic here is one union + one self-join/groupBy over
O(models · queries · k) rows — driver never materializes result sets. The
zero-overlap grid is built from the model list (driver-side constant) ×
distinct query_ids, so pairs with empty intersections still appear as 0
(the reference emits every pair key).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tagged(ranked: dict[str, DataFrame]) -> DataFrame:
    parts = [
        df.select(
            "query_id",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
            F.lit(m).alias("model"),
        )
        for m, df in ranked.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def model_overlap(ranked: dict[str, DataFrame]) -> DataFrame:
    """ranked: model → (query_id, rank, doc_id) top-k frame.
    → (query_id, model_a, model_b, overlap) for every unordered model
    pair (model_a < model_b lexicographically), zero-filled."""
    spark = next(iter(ranked.values())).sparkSession
    t = _tagged(ranked)
    a = t.select("query_id", "doc_id", F.col("model").alias("model_a"))
    b = t.select("query_id", "doc_id", F.col("model").alias("model_b"))
    counts = (
        a.join(b, ["query_id", "doc_id"])
        .filter(F.col("model_a") < F.col("model_b"))
        .groupBy("query_id", "model_a", "model_b")
        .agg(F.count("*").alias("overlap"))
    )
    pairs = spark.createDataFrame(
        [(x, y) for x, y in combinations(sorted(ranked), 2)],
        "model_a string, model_b string",
    )
    grid = t.select("query_id").distinct().crossJoin(F.broadcast(pairs))
    return (
        grid.join(counts, ["query_id", "model_a", "model_b"], "left")
        .fillna({"overlap": 0})
        .select("query_id", "model_a", "model_b", F.col("overlap").cast("long"))
    )


def unique_docs(ranked: dict[str, DataFrame]) -> DataFrame:
    """→ (query_id, model, unique_count): docs only that model returned
    (reference's unique_docs block), zero-filled per (query, model)."""
    spark = next(iter(ranked.values())).sparkSession
    t = _tagged(ranked)
    per_doc = t.groupBy("query_id", "doc_id").agg(
        F.countDistinct("model").alias("n_models"),
        F.min("model").alias("only_model"),
    )
    counts = (
        per_doc.filter(F.col("n_models") == 1)
        .groupBy("query_id", F.col("only_model").alias("model"))
        .agg(F.count("*").alias("unique_count"))
    )
    models = spark.createDataFrame([(m,) for m in sorted(ranked)], "model string")
    grid = t.select("query_id").distinct().crossJoin(F.broadcast(models))
    return (
        grid.join(counts, ["query_id", "model"], "left")
        .fillna({"unique_count": 0})
        .select("query_id", "model", F.col("unique_count").cast("long"))
    )


def rank_changes(ranked: dict[str, DataFrame], top_n: int = 50) -> DataFrame:
    """→ (query_id, doc_id, n_models, rank_span) for docs ranked by >1
    model, top_n by span desc (reference's rank_changes[:50]; ties broken
    doc_id asc for determinism — the reference's sort is Python-stable
    over dict order, undefined across runs)."""
    t = _tagged(ranked)
    spans = (
        t.groupBy("query_id", "doc_id")
        .agg(
            F.countDistinct("model").alias("n_models"),
            (F.max("rank") - F.min("rank")).alias("rank_span"),
        )
        .filter(F.col("n_models") > 1)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rank_span"), F.asc("doc_id")
    )
    return (
        spans.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_n)
        .drop("_rn")
    )
