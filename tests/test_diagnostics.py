"""Cross-model diagnostics matrix (Q28): column sums must reproduce each
model's full scorer exactly — the matrix is a decomposition, not a
re-derivation (reference ranking_diagnostics_service.py builds it by
calling each model's explain path; any drift between matrix and scorer
would make the diagnostics lie)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.query.bim import score_bim
from news_information_retrieval_system_spark.query.bm25 import (
    query_terms_df,
    score_bm25,
    topk,
)
from news_information_retrieval_system_spark.query.diagnostics import (
    model_term_matrix,
)
from news_information_retrieval_system_spark.query.lm import score_lm
from news_information_retrieval_system_spark.query.vsm import score_tfidf

QUERIES = {"qa": "fast index scan", "qb": "the fox index", "qc": "bm25 index bm25"}


@pytest.fixture(scope="module")
def setup(spark, mini_docs):
    idx = build_index(mini_docs)
    idx.persist()
    q = query_terms_df(spark, QUERIES)
    pairs = topk(score_bm25(idx, q), k=2).select("query_id", "doc_id")
    m = model_term_matrix(idx, q, pairs, mu=50.0)
    return idx, q, pairs, m


def _sums(m, col):
    return {
        (r["query_id"], r["doc_id"]): r["s"]
        for r in m.groupBy("query_id", "doc_id")
        .agg(F.sum(col).alias("s"))
        .collect()
    }


def _scores(scored, pairs):
    return {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in scored.join(pairs, ["query_id", "doc_id"]).collect()
    }


def test_bm25_column_sums_to_scorer(setup):
    idx, q, pairs, m = setup
    got = _sums(m, "bm25_term")
    want = _scores(score_bm25(idx, q), pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_tfidf_column_sums_to_scorer(setup):
    idx, q, pairs, m = setup
    got = _sums(m, "tfidf_term")
    want = _scores(score_tfidf(idx, q), pairs)
    # score_tfidf filters score>0; matrix keeps zero rows — compare on
    # the scorer's support, and every extra matrix pair must sum to 0
    for k, v in want.items():
        assert got.pop(k) == pytest.approx(v, rel=1e-12)
    for k, v in got.items():
        assert v == pytest.approx(0.0, abs=1e-12)


def test_lm_column_sums_to_scorer(setup):
    idx, q, pairs, m = setup
    got = _sums(m, "lm_term")
    want = _scores(score_lm(idx, q, mu=50.0), pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bim_column_sums_to_scorer(setup):
    idx, q, pairs, m = setup
    # BIM dedups query terms (qc has bm25 twice → counted once) and only
    # present terms contribute; matrix rows carry the weight per distinct
    # term with tf>0, so the sum over matched rows equals the RSJ score
    got = {
        (r["query_id"], r["doc_id"]): r["s"]
        for r in m.filter("matched")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("bim_term").alias("s"))
        .collect()
    }
    want = _scores(score_bim(idx, q), pairs)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_absent_terms_have_model_consistent_zeros(setup):
    _, _, _, m = setup
    rows = m.filter(~F.col("matched")).collect()
    assert rows, "expected at least one absent-term row in the mini corpus"
    for r in rows:
        assert r["tf"] == 0
        assert r["bm25_term"] == 0.0
        assert r["tfidf_term"] == 0.0
        assert r["bim_term"] == 0.0
        assert r["lm_term"] < 0.0  # smoothed background log-prob, never 0
