"""LTR sandbox (A12): feature export semantics + logistic training.

Reference parity pins: learning_to_rank_feature_service.py:140-197
(feature row shape), learning_to_rank_training_service.py:38-122
(standardized balanced logistic regression, refusal codes).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.ops.ltr import (
    FEATURE_COLS,
    ltr_features,
    ltr_train,
)
from news_information_retrieval_system_spark.query.bm25 import (
    query_terms_df,
    score_bm25,
    topk,
)


@pytest.fixture(scope="module")
def idx(mini_docs):
    ix = build_index(mini_docs)
    ix.persist()
    yield ix
    ix.unpersist()


@pytest.fixture(scope="module")
def qterms(spark):
    return query_terms_df(
        spark, {"qa": "fast index", "qb": "fox index", "qc": "spark bm25"}
    )


def test_feature_rows_shape_and_label(idx, qterms):
    feats = ltr_features(idx, qterms, k_cand=4)
    rows = {(r["query_id"], r["doc_id"]): r for r in feats.collect()}
    # candidates = BM25 top-4 per query, every row carries all features
    per_q = {}
    for (qid, _), r in rows.items():
        per_q.setdefault(qid, []).append(r)
    assert set(per_q) == {"qa", "qb", "qc"}
    for qid, rs in per_q.items():
        assert len(rs) <= 4
        for r in rs:
            assert r["query_term_count"] == 2
            assert 1 <= r["match_count"] <= 2
            # weak label == all query terms present
            assert r["label"] == (1.0 if r["match_count"] == 2 else 0.0)
            assert r["dl"] > 0

    # doc 2 "fast queries need a fast index and a fast scan" matches both
    # "fast index" terms → label 1; doc 1 (index only) → label 0
    assert rows[("qa", 2)]["label"] == 1.0
    assert rows[("qa", 1)]["label"] == 0.0


def test_bm25_feature_equals_ranking_score(idx, qterms):
    feats = ltr_features(idx, qterms, k_cand=4)
    scored = topk(
        score_bm25(idx, qterms).withColumn("score", F.round("score", 9)), k=4
    )
    got = {
        (r["query_id"], r["doc_id"]): r["bm25_score"] for r in feats.collect()
    }
    want = {
        (r["query_id"], r["doc_id"]): r["score"] for r in scored.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_train_returns_balanced_finite_model(idx, qterms):
    feats = ltr_features(idx, qterms, k_cand=4)
    coefs, report = ltr_train(feats)
    by_feat = {r["feature"]: r["coefficient"] for r in coefs.collect()}
    assert set(by_feat) == set(FEATURE_COLS) | {"__intercept__"}
    assert all(math.isfinite(v) for v in by_feat.values())
    # the label is "all terms matched": match_count must carry positive
    # weight in any sane fit of these features
    assert by_feat["match_count"] > 0
    n = feats.count()
    assert report["row_count"] == n
    assert report["class_balance"][0] + report["class_balance"][1] == n
    assert 0.5 <= report["training_accuracy"] <= 1.0
    for r in coefs.collect():
        assert r["direction"] == (
            "positive" if r["coefficient"] >= 0 else "negative"
        )


def test_train_refusals(spark):
    tiny = spark.createDataFrame(
        [(1.0, 1, 1, 1, 1.0, 1.0, 1.0), (0.0, 1, 0, 2, 0.5, 0.4, -1.0)],
        "label double, query_term_count long, match_count long, dl long,"
        " bm25_score double, tfidf_score double, lm_score double",
    )
    with pytest.raises(ValueError, match="INSUFFICIENT_ROWS"):
        ltr_train(tiny)
    single = spark.createDataFrame(
        [(1.0, 1, 1, 1, 1.0, 1.0, 1.0)] * 5,
        "label double, query_term_count long, match_count long, dl long,"
        " bm25_score double, tfidf_score double, lm_score double",
    )
    with pytest.raises(ValueError, match="SINGLE_CLASS"):
        ltr_train(single)
