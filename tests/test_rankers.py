"""Rank-identity for TF-IDF/VSM, LM (Dirichlet), BIM vs the oracle; RRF sanity."""

import pytest

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.oracle import OracleIndex
from news_information_retrieval_system_spark.query.bim import bim_topk
from news_information_retrieval_system_spark.query.bm25 import query_terms_df
from news_information_retrieval_system_spark.query.hybrid import hybrid_topk
from news_information_retrieval_system_spark.query.lm import lm_topk
from news_information_retrieval_system_spark.query.vsm import tfidf_topk

from conftest import MINI_CORPUS

QUERIES = {"q1": "fast index", "q2": "the fox", "q3": "spark bm25", "q4": "scan"}


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: [x[1:] for x in sorted(v)] for q, v in out.items()}


@pytest.fixture(scope="module")
def idx(spark, mini_docs):
    return build_index(mini_docs)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(MINI_CORPUS)


@pytest.fixture(scope="module")
def qdf(spark):
    return query_terms_df(spark, QUERIES)


def _assert_identical(got, oracle_fn, rel=1e-9):
    for qid, text in QUERIES.items():
        want = oracle_fn(text)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, have, want)
        for (_, sg), (_, sw) in zip(have, want):
            assert sg == pytest.approx(sw, rel=rel), qid


def test_tfidf_rank_identity(spark, idx, oracle, qdf):
    got = _by_query(tfidf_topk(idx, qdf, k=5).collect())
    _assert_identical(got, lambda t: oracle.tfidf(t, k=5))


def test_lm_dirichlet_rank_identity(spark, idx, oracle, qdf):
    got = _by_query(lm_topk(idx, qdf, k=5, mu=2000.0).collect())
    _assert_identical(got, lambda t: oracle.lm_dirichlet(t, k=5, mu=2000.0))


def test_bim_rank_identity(spark, idx, oracle, qdf):
    got = _by_query(bim_topk(idx, qdf, k=5).collect())
    _assert_identical(got, lambda t: oracle.bim(t, k=5))


def test_hybrid_rrf(spark, idx, oracle, qdf):
    got = _by_query(hybrid_topk(idx, qdf, k=5).collect())
    # RRF of bm25+tfidf: fused score of every returned doc must equal the
    # hand-computed weighted reciprocal rank sum
    bm25 = {q: oracle.bm25(t, k=50) for q, t in QUERIES.items()}
    tfidf = {q: oracle.tfidf(t, k=50) for q, t in QUERIES.items()}
    for qid in QUERIES:
        r1 = {d: i + 1 for i, (d, _) in enumerate(bm25[qid])}
        r2 = {d: i + 1 for i, (d, _) in enumerate(tfidf[qid])}
        fused = {}
        for d, r in r1.items():
            fused[d] = fused.get(d, 0) + 0.65 / (60 + r)
        for d, r in r2.items():
            fused[d] = fused.get(d, 0) + 0.35 / (60 + r)
        want = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:5]
        have = got[qid]
        assert [d for d, _ in have] == [d for d, _ in want]
        for (_, sg), (_, sw) in zip(have, want):
            assert sg == pytest.approx(sw, rel=1e-12)
