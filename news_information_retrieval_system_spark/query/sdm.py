"""Sequential Dependence Model ranking (Metzler & Croft, SIGIR 2005).

The engine's term-dependence ranker: where BM25/LM treat query terms as
independent, SDM adds adjacent-pair evidence from the positional index —

    score(q,d) = w_T Σ_i f_T(q_i, d)                (unigram LM, Dirichlet)
               + w_O Σ_i f_O(q_i q_{i+1}, d)        (exact ordered bigram)
               + w_U Σ_i f_U(q_i q_{i+1}, d)        (unordered window-N co-occ)

with the canonical weights (0.85, 0.1, 0.05) and each f a Dirichlet
log-probability log((cnt + μ·cf/|C|) / (dl + μ)) over the matching count
type. Pairs unseen in the whole collection are dropped (they shift every
candidate equally, exactly the unigram LM's unseen-term rule in
query/lm.py). The reference stops at independent-term models
(src/ir/retrieval/{bm25,language_model_retrieval}.py) + positional
post-filters (positional_index.py) — SDM composes those two assets into
the standard proximity-aware ranker.

Spark shape: the unigram part IS score_lm (reused verbatim). Pair
counts come from ONE self-join of the positional frame per distinct
query pair — posting-list sized, not corpus-sized — with the
ordered/unordered counts computed inside JVM higher-order functions
(aggregate/filter over the two position arrays; no explode of
positions, no Python). Collection pair frequencies are a groupBy over
that same join's output; candidates and dl ride the unigram expansion.
Determinism: scores round to 9dp before the final top-k.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from ..tokenize import py_tokenize
from .bm25 import topk
from .lm import score_lm

SDM_WEIGHTS = (0.85, 0.1, 0.05)
SDM_WINDOW = 8


def query_pairs_df(spark: SparkSession, queries: dict[str, str]) -> DataFrame:
    """{query_id: text} → (query_id, pa, pb, pcnt): adjacent ordered
    token pairs with multiplicity, tokenized driver-side like
    query_terms_df (queries are tiny)."""
    rows = []
    for qid, text in queries.items():
        toks = py_tokenize(text)
        for (a, b), cnt in sorted(Counter(zip(toks, toks[1:])).items()):
            rows.append((qid, a, b, cnt))
    return spark.createDataFrame(
        rows, "query_id string, pa string, pb string, pcnt int"
    )


def _pair_counts(positional: DataFrame, dpairs: DataFrame, window: int) -> DataFrame:
    """Distinct (pa, pb) × positional self-join → per-doc ordered and
    unordered-window match counts: (pa, pb, doc_id, ocnt, ucnt)."""
    a = positional.join(
        F.broadcast(dpairs), positional["term"] == dpairs["pa"]
    ).select("pa", "pb", "doc_id", F.col("positions").alias("posa"))
    b = positional.select(
        F.col("term").alias("pb"), "doc_id", F.col("positions").alias("posb")
    )
    ab = a.join(b, ["pb", "doc_id"])
    ocnt = F.expr(
        "aggregate(posa, 0, (acc, x) -> acc + size(filter(posb, y -> y - x = 1)))"
    )
    ucnt = F.expr(
        "aggregate(posa, 0, (acc, x) -> acc + "
        f"size(filter(posb, y -> y != x AND abs(y - x) <= {window - 1})))"
    )
    return ab.select(
        "pa", "pb", "doc_id", ocnt.alias("ocnt"), ucnt.alias("ucnt")
    )


def score_sdm(
    index: FulltextIndex,
    positional: DataFrame,
    qterms: DataFrame,
    qpairs: DataFrame,
    mu: float = 2000.0,
    weights: tuple[float, float, float] = SDM_WEIGHTS,
    window: int = SDM_WINDOW,
) -> DataFrame:
    """qterms(query_id, term[, qtf]) + qpairs(query_id, pa, pb, pcnt) →
    (query_id, doc_id, score), unranked. Candidates = the unigram LM's
    candidate set; pair features contribute their Dirichlet background
    to every candidate (cnt=0 when the doc lacks the pair)."""
    w_t, w_o, w_u = weights
    uni = score_lm(index, qterms, mu=mu)

    dpairs = qpairs.select("pa", "pb").distinct()  # tiny
    counts = _pair_counts(positional, dpairs, window)
    cfs = counts.groupBy("pa", "pb").agg(
        F.sum("ocnt").alias("cfo"), F.sum("ucnt").alias("cfu")
    )
    total = index.doc_stats.agg(
        F.sum("dl").cast("double").alias("total_tokens")
    )

    cand = uni.select("query_id", "doc_id").join(
        index.doc_stats.select("doc_id", "dl"), "doc_id"
    )
    base = (
        cand.join(F.broadcast(qpairs), "query_id")
        .join(F.broadcast(cfs), ["pa", "pb"])
        .join(F.broadcast(total), how="cross")
        .join(counts, ["pa", "pb", "doc_id"], "left")
        .fillna({"ocnt": 0, "ucnt": 0})
    )

    def feature(cnt_col: str, cf_col: str, out: str) -> DataFrame:
        return (
            base.filter(F.col(cf_col) > 0)
            .withColumn(
                "contrib",
                F.col("pcnt")
                * F.log(
                    (F.col(cnt_col) + mu * F.col(cf_col) / F.col("total_tokens"))
                    / (F.col("dl") + F.lit(mu))
                ),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.sum("contrib").alias(out))
        )

    fo = feature("ocnt", "cfo", "fo")
    fu = feature("ucnt", "cfu", "fu")
    return (
        uni.join(fo, ["query_id", "doc_id"], "left")
        .join(fu, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            (
                w_t * F.col("score")
                + w_o * F.coalesce(F.col("fo"), F.lit(0.0))
                + w_u * F.coalesce(F.col("fu"), F.lit(0.0))
            ).alias("score"),
        )
    )


def sdm_topk(
    index: FulltextIndex,
    positional: DataFrame,
    qterms: DataFrame,
    qpairs: DataFrame,
    k: int = 10,
    mu: float = 2000.0,
    weights: tuple[float, float, float] = SDM_WEIGHTS,
    window: int = SDM_WINDOW,
) -> DataFrame:
    scored = score_sdm(
        index, positional, qterms, qpairs, mu=mu, weights=weights, window=window
    ).withColumn("score", F.round("score", 9))
    return topk(scored, k=k)
