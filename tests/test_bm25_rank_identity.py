"""Rank-identity: Spark BM25 == pure-Python reference oracle
(same top-k doc_ids AND scores), per BASELINE.json north_rule."""

import pytest

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.oracle import OracleIndex
from news_information_retrieval_system_spark.query.bm25 import bm25_topk, query_terms_df

from conftest import MINI_CORPUS

QUERIES = {
    "q1": "fast index",
    "q2": "the fox",
    "q3": "bm25 term frequency",
    "q4": "index index scan",  # duplicate query term → double contribution
    "q5": "nosuchterm",
    "q6": "spark",
}


@pytest.mark.parametrize("k1,b", [(1.2, 0.75), (1.5, 0.75)])
def test_bm25_rank_identity(spark, mini_docs, k1, b):
    idx = build_index(mini_docs)
    oracle = OracleIndex(MINI_CORPUS)
    qdf = query_terms_df(spark, QUERIES)
    got = bm25_topk(idx, qdf, k=5, k1=k1, b=b).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, text in QUERIES.items():
        want = oracle.bm25(text, k=5, k1=k1, b=b)
        have = sorted(by_q.get(qid, []))
        assert [d for _, d, _ in have] == [d for d, _ in want], qid
        for (_, _, s_got), (_, s_want) in zip(have, want):
            assert s_got == pytest.approx(s_want, rel=1e-12), qid


def test_hand_computed_score(spark, mini_docs):
    # doc 0 "spark builds a fast index": dl=5, query "spark" df=2, N=8
    import math

    idx = build_index(mini_docs)
    oracle = OracleIndex(MINI_CORPUS)
    idf = math.log(1 + (8 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75
    dl, avgdl = 5, oracle.avgdl
    want = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * dl / avgdl))
    qdf = query_terms_df(spark, {"q": "spark"})
    rows = bm25_topk(idx, qdf, k=2).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[0] == pytest.approx(want, rel=1e-12)
