"""Two-phase retrieve-then-rerank (query/rerank.py)."""

from __future__ import annotations

import pytest

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.ops.ltr import ltr_features
from news_information_retrieval_system_spark.query.bm25 import bm25_topk
from news_information_retrieval_system_spark.query.rerank import rerank_topk


def _qterms(spark, queries):
    rows = [
        (qid, t, 1) for qid, text in queries.items() for t in text.split()
    ]
    return spark.createDataFrame(rows, "query_id string, term string, qtf int")


def test_bm25_identity_weights(spark, mini_docs):
    # weights = {bm25_score: 1} reranks to exactly the phase-1 order
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "fast index", "q2": "inverted index bm25"})
    rr = rerank_topk(idx, q, weights={"bm25_score": 1.0}, k_cand=8, k=4)
    bm = bm25_topk(idx, q, k=4)
    got = [
        (r.query_id, r.rank, r.doc_id, r.phase1_rank)
        for r in rr.orderBy("query_id", "rank").collect()
    ]
    want = [
        (r.query_id, r.rank, r.doc_id, r.rank)
        for r in bm.orderBy("query_id", "rank").collect()
    ]
    assert got == want


def test_linear_score_matches_feature_dot_product(spark, mini_docs):
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "fast index scan"})
    weights = {"bm25_score": 0.6, "lm_score": 0.3, "dl": -0.01}
    intercept = 0.25
    rr = {
        r.doc_id: r.score
        for r in rerank_topk(
            idx, q, weights=weights, intercept=intercept, k_cand=8, k=8
        ).collect()
    }
    feats = ltr_features(idx, q, k_cand=8).collect()
    assert rr
    for f in feats:
        want = intercept + sum(weights[c] * getattr(f, c) for c in weights)
        assert rr[f.doc_id] == pytest.approx(round(want, 9), abs=1e-9)


def test_rerank_moves_candidates(spark, mini_docs):
    # a pure doc-length model inverts BM25's preference somewhere in the
    # pool — phase1_rank records the movement
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "index"})
    rr = rerank_topk(idx, q, weights={"dl": 1.0}, k_cand=8, k=8).collect()
    assert any(r.rank != r.phase1_rank for r in rr)
    # longest candidate wins under the dl-only model
    top = min(rr, key=lambda r: r.rank)
    assert top.score == max(r.score for r in rr)


def test_unknown_weight_raises(spark, mini_docs):
    idx = build_index(mini_docs)
    q = _qterms(spark, {"q1": "index"})
    with pytest.raises(ValueError, match="unknown feature"):
        rerank_topk(idx, q, weights={"pagerank": 1.0})
