from __future__ import annotations

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index import build_index
from news_information_retrieval_system_spark.query.bm25 import (
    query_terms_df,
    score_bm25,
    topk,
)
from news_information_retrieval_system_spark.query.champion import (
    build_champion_lists,
    champion_topk,
)


def test_tier_depth_is_enforced(spark, mini_docs):
    ch = build_champion_lists(build_index(mini_docs), m=2)
    worst = ch.groupBy("term").agg(F.count("*").alias("n")).agg(
        F.max("n")
    ).collect()[0][0]
    assert worst <= 2


def test_single_term_query_is_rank_identical_to_bm25(spark, mini_docs):
    # With m ≥ k, a one-term query's champion ranking IS the exhaustive
    # BM25 ranking: the tier orders by the same impact that scores it.
    idx = build_index(mini_docs)
    q = query_terms_df(spark, {"q1": "index", "q2": "fast"})
    ch = champion_topk(build_champion_lists(idx, m=8), q, k=3).collect()
    ex = topk(
        score_bm25(idx, q).withColumn("score", F.round("score", 9)), k=3
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    ch_ids = {key(r): r["doc_id"] for r in ch}
    ex_ids = {key(r): r["doc_id"] for r in ex}
    assert ch_ids == ex_ids
    for r in ch:
        exact = [e["score"] for e in ex if key(e) == key(r)][0]
        assert abs(r["score"] - exact) < 1e-8


def test_multi_term_candidates_come_only_from_tiers(spark, mini_docs):
    # m=1 keeps one champion per term: every retrieved doc must be some
    # query term's single champion.
    idx = build_index(mini_docs)
    ch = build_champion_lists(idx, m=1)
    q = query_terms_df(spark, {"q1": "fast index scan"})
    out = champion_topk(ch, q, k=10)
    allowed = {
        r["doc_id"]
        for r in ch.join(
            q.select("term").distinct(), "term"
        ).select("doc_id").collect()
    }
    got = {r["doc_id"] for r in out.collect()}
    assert got and got <= allowed
