"""Champion lists: impact-ordered tiered retrieval (Manning IR §7.1).

The third member of the engine's top-k family — exhaustive BM25
(query/bm25.py), safe dynamic pruning (query/wand.py block-max WAND), and
THIS: a static index-time prune. Per term, precompute the top-``m`` docs
by query-independent BM25 impact (the score contribution at qtf=1):

    impact(t,d) = idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

and answer queries from the union of the query terms' champion lists
only, summing STORED impacts — no postings scan, no per-doc recompute.
This trades bounded recall (a doc outside every query term's champion
tier can't be retrieved) for a candidate set of ≤ m·|q| rows per query;
it is the standard first tier in front of an exhaustive or WAND
fallback. For single-term queries with k ≤ m the result is provably
rank-identical to exhaustive BM25 (pinned by test).

Spark shape: the build is one impact projection over the postings frame
plus a per-term top-m (window rank). The per-term sort is a build-time
cost; the term-hash partitioning that shards postings also shards this
sort, and the hot-term skew story is the same as the index build's
(term-sharded, AQE skew-join on). Query time touches ONLY the champion
frame — m·|vocab| rows instead of the full postings — joined against a
broadcast query side; on disk the champion tier is small enough to
cache, which is the point at 10^12 docs.

Determinism: impacts round to 9dp before the per-term rank (ties →
doc_id asc); query scores round to 9dp before the final top-k — the
engine-wide discipline, so an independent SQL engine reproduces every
tier and rank exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .bm25 import topk


def champion_impacts(
    index: FulltextIndex, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """→ (term, doc_id, impact): per-posting query-independent BM25
    impact, 9dp-rounded."""
    hits = index.postings.join(index.term_stats, "term").join(
        F.broadcast(index.stats), how="cross"
    )
    impact = F.col("idf") * (
        (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return hits.select("term", "doc_id", F.round(impact, 9).alias("impact"))


def build_champion_lists(
    index: FulltextIndex, m: int = 128, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """→ (term, doc_id, impact, champ_rank ≤ m): the champion tier."""
    w = Window.partitionBy("term").orderBy(F.desc("impact"), F.asc("doc_id"))
    return (
        champion_impacts(index, k1=k1, b=b)
        .withColumn("champ_rank", F.row_number().over(w))
        .filter(F.col("champ_rank") <= m)
    )


def champion_topk(
    champions: DataFrame, qterms: DataFrame, k: int = 10
) -> DataFrame:
    """Answer from the champion tier only: (query_id, rank, doc_id,
    score). Scores are sums of stored impacts over the query's terms —
    a doc missing from a term's tier simply contributes 0 for that term
    (the documented recall trade)."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    hits = champions.join(F.broadcast(qterms), "term")
    scored = (
        hits.groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("qtf") * F.col("impact")), 9).alias("score"))
    )
    return topk(scored, k=k)
