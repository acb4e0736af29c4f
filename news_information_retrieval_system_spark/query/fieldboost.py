"""Field-boost reranking and facet analytics.

Reference field boost (src/ir_app/services/search_service.py:434-481):
boost = Σ_field weight · min(unique query-term hits in field, 3), capped at
1.5, ADDED to the model score, then re-sorted. Field weights: title .45 /
tags .25 / category .18 / content .06. Applied as an optional post-stage.

Facet counts (src/ir_app/services/facet_service.py:123-215): value→count
per facet field with top-k values — a groupBy + window in Spark; the
reference's retrieve-all-then-filter anti-pattern (search_service.py:108)
becomes filter-before-score via predicate pushdown.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenize import tokens_col

DEFAULT_FIELD_WEIGHTS = {"title": 0.45, "tags": 0.25, "category": 0.18, "content": 0.06}
BOOST_CAP = 1.5
HITS_CAP = 3


def field_boost_rerank(
    scored: DataFrame,
    docs: DataFrame,
    qterms: DataFrame,
    field_weights: Mapping[str, float] | None = None,
) -> DataFrame:
    """scored(query_id, doc_id, score) + docs(doc_id, <fields>) +
    qterms(query_id, term) → rescored with the reference's additive field
    boost. Fields present in ``docs`` and in the weight map participate;
    array columns count term membership, string columns count token hits.

    Scale shape: a top-k rerank must only ever touch the candidate docs, so
    ``docs`` is semi-joined to ``scored``'s doc_ids BEFORE any field is
    tokenized/exploded — the corpus never flows through the explode."""
    weights = field_weights or DEFAULT_FIELD_WEIGHTS
    dtypes = dict(docs.dtypes)
    q = qterms.select("query_id", "term").distinct()
    docs = docs.join(scored.select("doc_id").distinct(), "doc_id", "left_semi")
    boosts = None
    for field, wgt in weights.items():
        if field not in dtypes:
            continue
        if dtypes[field].startswith("array"):
            toks = docs.select("doc_id", F.explode(field).alias("term"))
        else:
            toks = docs.select(
                "doc_id", F.explode(tokens_col(F.col(field))).alias("term")
            ).distinct()
        hits = (
            toks.join(F.broadcast(q), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.countDistinct("term").alias("hits"))
            .withColumn("fb", F.lit(wgt) * F.least(F.col("hits"), F.lit(HITS_CAP)))
            .select("query_id", "doc_id", "fb")
        )
        boosts = hits if boosts is None else boosts.unionByName(hits)
    if boosts is None:
        return scored
    total = (
        boosts.groupBy("query_id", "doc_id")
        .agg(F.least(F.sum("fb"), F.lit(BOOST_CAP)).alias("boost"))
    )
    return (
        scored.join(total, ["query_id", "doc_id"], "left")
        .fillna({"boost": 0.0})
        .withColumn("score", F.col("score") + F.col("boost"))
        .drop("boost")
    )


def facet_counts(docs: DataFrame, field: str, top_values: int = 10) -> DataFrame:
    """value → count for one facet field, top values first."""
    col = F.explode(field) if dict(docs.dtypes).get(field, "").startswith("array") else F.col(field)
    counts = docs.select(col.alias("value")).groupBy("value").agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_values)
        .select("value", "cnt", "rank")
    )


def facet_counts_multi(docs: DataFrame, fields: list[str], top_values: int = 10) -> DataFrame:
    parts = [
        facet_counts(docs, f, top_values).withColumn("facet", F.lit(f)) for f in fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("facet", "value", "cnt", "rank")
