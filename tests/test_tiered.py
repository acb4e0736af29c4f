"""Tiered-index retrieval (query/tiered.py): degenerate equivalences and
the per-query adaptive fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.query.bm25 import bm25_topk
from news_information_retrieval_system_spark.query.champion import (
    build_champion_lists,
    champion_topk,
)
from news_information_retrieval_system_spark.query.tiered import (
    build_tiered_lists,
    tiered_topk,
)


def _qterms(spark, queries):
    rows = [
        (qid, t, 1) for qid, text in queries.items() for t in text.split()
    ]
    return spark.createDataFrame(rows, "query_id string, term string, qtf int")


def test_single_tier_equals_champion_lists(spark, mini_docs):
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "fast index", "q2": "fox"})
    ch = champion_topk(build_champion_lists(idx, m=4), q, k=3)
    td = tiered_topk(build_tiered_lists(idx, depths=(4,)), q, k=3)
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 9), r.tier)
        for r in td.collect()
    }
    want = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 9))
        for r in ch.collect()
    }
    assert set(got) == set(want)
    for key, (doc, score, tier) in got.items():
        assert (doc, score) == want[key]
        assert tier == 1  # single tier: every query resolves at level 1


def test_deep_single_tier_equals_exhaustive_bm25(spark, mini_docs):
    # a tier deeper than any df keeps every posting → stored-impact sums
    # are exactly the BM25 scores
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "fast index scan", "q2": "inverted index"})
    td = tiered_topk(build_tiered_lists(idx, depths=(10_000,)), q, k=5)
    bm = bm25_topk(idx, q, k=5)
    got = [
        (r.query_id, r.rank, r.doc_id)
        for r in td.orderBy("query_id", "rank").collect()
    ]
    want = [
        (r.query_id, r.rank, r.doc_id)
        for r in bm.orderBy("query_id", "rank").collect()
    ]
    assert got == want


def test_fallback_descends_until_k(spark, mini_docs):
    # one-term query, tier depths (1, 2, 8), k=3: tier 1 holds 1 doc,
    # tier 2 holds 2 → both short of k, so the query must resolve at
    # tier 3 and recover the full BM25 answer
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "index"})
    td = tiered_topk(build_tiered_lists(idx, depths=(1, 2, 8)), q, k=3)
    rows = td.orderBy("rank").collect()
    assert [r.tier for r in rows] == [3, 3, 3]
    bm = bm25_topk(idx, q, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in bm]


def test_stops_at_first_sufficient_tier(spark, mini_docs):
    # same query with k=1: tier 1 already holds one candidate → chosen
    # tier is 1 and only the tier-1 impact is scored
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "index"})
    td = tiered_topk(build_tiered_lists(idx, depths=(1, 2, 8)), q, k=1)
    rows = td.collect()
    assert len(rows) == 1 and rows[0].tier == 1


def test_bad_depths_raise(spark, mini_docs):
    idx = build_index(mini_docs)
    with pytest.raises(ValueError):
        build_tiered_lists(idx, depths=(8, 4))
    with pytest.raises(ValueError):
        build_tiered_lists(idx, depths=())


def test_dropped_tail_is_unreachable(spark, mini_docs):
    # depths=(1,): only each term's single top-impact doc exists in the
    # tiered structure at all
    idx = build_index(mini_docs)
    t = build_tiered_lists(idx, depths=(1,))
    per_term = t.groupBy("term").count().agg(F.max("count")).collect()[0][0]
    assert per_term == 1
