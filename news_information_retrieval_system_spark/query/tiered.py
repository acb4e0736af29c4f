"""Tiered indexes: impact-ordered lists with per-query adaptive fallback
(Manning IR §7.2.1).

The generalization of champion lists (query/champion.py): instead of ONE
static per-term tier of depth m, each posting is assigned to the first
tier whose depth its impact rank fits (e.g. depths (4, 32, 256); postings
ranked past the last depth are dropped from the tiered structure
entirely). Query processing starts from tier 1 — the union of the query
terms' tier-1 lists — and falls back tier by tier until at least ``k``
candidate docs are in play (or tiers run out), then scores candidates by
summing the STORED impacts of all hits in tiers ≤ the chosen tier. The
reference's single champion tier is the degenerate depths=(m,) case;
reference impact semantics per src/ir/ranking/bm25.py:60-104 (the same
query-independent per-posting BM25 contribution champion lists store).

Spark shape: the build is champion_impacts + ONE per-term window rank
(same shuffle as champion lists — term-sharded, AQE skew-join handles the
hot-term tail), bucketed into a tier column by a CASE expression, so the
tiered structure is a single frame that on disk clusters by (tier, term)
— at 10^12 docs tier 1 is the cache-resident sliver, deeper tiers page
in only for queries that need them. Per-query tier choice is data-
dependent but fully declarative: one groupBy for each doc's first
(lowest) tier, a cumulative count over the ≤ n_tiers distinct tier
levels, and a min-conditional aggregate — no driver loop, no collect;
the fallback decision for EVERY query in the batch resolves in one plan.

Determinism: impacts round to 9dp before the per-term rank (ties →
doc_id asc), scores round to 9dp before the final top-k — the
engine-wide discipline, so an independent SQL engine reproduces tier
assignment, tier choice, and ranking exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .champion import champion_impacts


def build_tiered_lists(
    index: FulltextIndex,
    depths: Sequence[int] = (4, 32, 256),
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """→ (term, doc_id, impact, tier): per-term impact-ordered postings
    bucketed into tiers 1..len(depths) by rank cutoffs ``depths``
    (strictly increasing); postings ranked past ``depths[-1]`` are
    dropped — they are unreachable by tiered query processing."""
    if not depths or list(depths) != sorted(set(depths)):
        raise ValueError(f"depths must be strictly increasing, got {depths!r}")
    w = Window.partitionBy("term").orderBy(F.desc("impact"), F.asc("doc_id"))
    ranked = champion_impacts(index, k1=k1, b=b).withColumn(
        "_r", F.row_number().over(w)
    )
    tier = F.when(F.col("_r") <= depths[0], 1)
    for i, d in enumerate(depths[1:], start=2):
        tier = tier.when(F.col("_r") <= d, i)
    return (
        ranked.filter(F.col("_r") <= depths[-1])
        .select("term", "doc_id", "impact", tier.alias("tier"))
    )


def tiered_topk(
    tiered: DataFrame, qterms: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query adaptive tiered retrieval → (query_id, rank, doc_id,
    score, tier): the smallest tier level whose cumulative candidate set
    reaches ``k`` docs is chosen per query (falling back to the deepest
    tier with any hits when no level reaches ``k``), and scores sum the
    stored impacts of hits in tiers ≤ that level. ``tier`` reports the
    chosen level — the observable cost knob (tier 1 ≡ champion-list
    answer; deeper ≡ more postings touched)."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    hits = tiered.join(F.broadcast(qterms), "term")
    # a doc becomes a candidate at the lowest tier any of its query-term
    # entries lives in; cumulative candidates per level decide fallback
    cand = hits.groupBy("query_id", "doc_id").agg(
        F.min("tier").alias("first_tier")
    )
    cum = (
        cand.groupBy("query_id", "first_tier")
        .agg(F.count("*").alias("_c"))
        .withColumn(
            "_cum",
            F.sum("_c").over(
                Window.partitionBy("query_id").orderBy("first_tier")
            ),
        )
    )
    chosen = cum.groupBy("query_id").agg(
        F.coalesce(
            F.min(F.when(F.col("_cum") >= k, F.col("first_tier"))),
            F.max("first_tier"),
        ).alias("tier")
    )
    scored = (
        hits.withColumnRenamed("tier", "hit_tier")
        .join(chosen, "query_id")
        .filter(F.col("hit_tier") <= F.col("tier"))
        .groupBy("query_id", "doc_id", "tier")
        .agg(F.round(F.sum(F.col("qtf") * F.col("impact")), 9).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "tier")
    )
