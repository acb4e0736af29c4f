from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index import build_index
from news_information_retrieval_system_spark.index.build import build_positional
from news_information_retrieval_system_spark.query.bm25 import query_terms_df
from news_information_retrieval_system_spark.query.lm import score_lm
from news_information_retrieval_system_spark.query.sdm import (
    query_pairs_df,
    score_sdm,
    sdm_topk,
)


def test_query_pairs_are_adjacent_ordered(spark):
    qp = query_pairs_df(spark, {"q1": "a b a b", "q2": "x"}).collect()
    got = {(r["query_id"], r["pa"], r["pb"]): r["pcnt"] for r in qp}
    assert got == {("q1", "a", "b"): 2, ("q1", "b", "a"): 1}


def test_zero_pair_weights_reduce_to_lm(spark, mini_docs):
    idx = build_index(mini_docs)
    pos = build_positional(mini_docs)
    q = {"q1": "fast index"}
    qt = query_terms_df(spark, q)
    qp = query_pairs_df(spark, q)
    sdm = score_sdm(idx, pos, qt, qp, weights=(1.0, 0.0, 0.0)).collect()
    lm = score_lm(idx, qt).collect()
    smap = {(r["query_id"], r["doc_id"]): r["score"] for r in sdm}
    lmap = {(r["query_id"], r["doc_id"]): r["score"] for r in lm}
    assert smap.keys() == lmap.keys()
    for k in smap:
        assert abs(smap[k] - lmap[k]) < 1e-12


def test_ordered_pair_evidence_breaks_lm_tie(spark):
    # Two docs with identical bags of words — the unigram LM cannot
    # separate them; only doc 0 contains the exact phrase "red fox".
    docs = spark.createDataFrame(
        [
            (0, "red fox runs far"),
            (1, "fox red runs far"),
            (2, "other words here now"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    pos = build_positional(docs)
    q = {"q1": "red fox"}
    out = sdm_topk(idx, pos, query_terms_df(spark, q), query_pairs_df(spark, q), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["doc_id"] == 0 and rows[1]["doc_id"] == 1
    assert rows[0]["score"] > rows[1]["score"]


def test_pair_feature_matches_hand_computation(spark):
    # One doc, one pair: f_O is checkable by hand.
    docs = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    idx = build_index(docs)
    pos = build_positional(docs)
    q = {"q1": "a b"}
    mu = 10.0
    out = score_sdm(
        idx, pos, query_terms_df(spark, q), query_pairs_df(spark, q),
        mu=mu, weights=(0.0, 1.0, 0.0),
    ).collect()
    # ocnt("a b") = 2, cf_o = 2, |C| = 5, dl = 5
    expect = math.log((2 + mu * 2 / 5) / (5 + mu))
    assert len(out) == 1
    assert abs(out[0]["score"] - expect) < 1e-12


def test_unordered_window_counts_both_directions(spark):
    # "b ... a" within the window must count for pair (a, b) via ucnt
    # even though ocnt = 0 — the U feature keys on |Δpos|, not order.
    docs = spark.createDataFrame(
        [(0, "b x a"), (1, "b x x x x x x x a")],  # gaps 2 and 8
        "doc_id long, text string",
    )
    idx = build_index(docs)
    pos = build_positional(docs)
    q = {"q1": "a b"}
    mu = 10.0
    out = {
        r["doc_id"]: r["score"]
        for r in score_sdm(
            idx, pos, query_terms_df(spark, q), query_pairs_df(spark, q),
            mu=mu, weights=(0.0, 0.0, 1.0), window=8,
        ).collect()
    }
    # doc 0: ucnt=1 (gap 2 ≤ 7); doc 1: ucnt=0 (gap 8 > 7); cf_u = 1
    assert abs(out[0] - math.log((1 + mu * 1 / 12) / (3 + mu))) < 1e-12
    assert abs(out[1] - math.log((0 + mu * 1 / 12) / (9 + mu))) < 1e-12
