"""Batch BM25 top-k over the flat postings table.

Scoring formula is exactly the reference's
(src/ir/retrieval/bm25.py:206-256):

    contribution(t, D) = IDF(t) * (tf(k1+1) / (tf + k1(1 - b + b*dl/avgdl)) + delta)
    IDF(t)             = ln(1 + (N - df + 0.5) / (df + 0.5))        (:187-204)
    score(D, Q)        = Σ_{t in Q} contribution  (duplicate query terms
                         contribute multiple times → qtf multiplier, :231-238)

Engine defaults k1=1.2, b=0.75 per BASELINE.json north_star (reference code
default is k1=1.5, bm25.py:89 — parametrized here, pinned per-test).

Physical plan (the point of the whole engine):
    postings ⋈ BROADCAST(query terms + idf)   — map-side, no shuffle
      → contribution column                    — whole-stage codegen
      → groupBy(query_id, doc_id).sum          — THE one shuffle, partial agg
      → per-query top-k                        — window row_number, or
                                                 TakeOrderedAndProject for 1 query
Candidate pruning (only docs sharing ≥1 query term, bm25.py:295-300) falls
out of the inner join structurally.

Tie-break is (score desc, doc_id asc) — the reference relies on Python
stable-sort over set-iteration order (non-deterministic); we define it
(SURVEY.md Q20) and the oracle matches.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from ..tokenize import py_tokenize


def query_terms_df(spark: SparkSession, queries: Mapping[str, str]) -> DataFrame:
    """{query_id: text} → (query_id, term, qtf); tokenized driver-side with
    the same tokenizer semantics (queries are tiny)."""
    rows = []
    for qid, text in queries.items():
        counts: dict[str, int] = {}
        for t in py_tokenize(text):
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in counts.items():
            rows.append((qid, term, qtf))
    return spark.createDataFrame(rows, "query_id string, term string, qtf int")


def score_bm25(
    index: FulltextIndex,
    qterms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 0.0,
) -> DataFrame:
    """qterms(query_id, term[, qtf]) → (query_id, doc_id, score), unranked."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    # tiny ⋈ big on term: broadcast the query side into term_stats, then
    # broadcast the (still tiny) result into the postings scan.
    qidf = index.term_stats.join(F.broadcast(qterms), "term").join(
        F.broadcast(index.stats), how="cross"
    )
    hits = index.postings.join(F.broadcast(qidf), "term")
    contrib = F.col("qtf") * F.col("idf") * (
        (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        + F.lit(delta)
    )
    return (
        hits.withColumn("contrib", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def topk(scores: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic per-query top-k: (score desc, doc_id asc)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk(
    index: FulltextIndex,
    qterms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 0.0,
) -> DataFrame:
    return topk(score_bm25(index, qterms, k1=k1, b=b, delta=delta), k=k)


def explain_scores(
    index: FulltextIndex,
    qterms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-(query, doc, term) breakdown — reference BM25.explain_score
    (src/ir/retrieval/bm25.py:326-404): tf, df, idf, normalized tf, score."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    qidf = index.term_stats.join(F.broadcast(qterms), "term").join(
        F.broadcast(index.stats), how="cross"
    )
    hits = index.postings.join(F.broadcast(qidf), "term")
    norm_tf = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return hits.select(
        "query_id",
        "doc_id",
        "term",
        "tf",
        "df",
        "idf",
        norm_tf.alias("norm_tf"),
        (F.col("qtf") * F.col("idf") * norm_tf).alias("term_score"),
    )
