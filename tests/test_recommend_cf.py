"""Collaborative filtering (ops/recommend_cf.py): hand-computed cosine
goldens, consumed-item exclusion, neighbor capping, hot-key guards."""

import math

import pytest

from news_information_retrieval_system_spark.ops.recommend_cf import (
    interactions,
    item_based_recs,
    item_similarities,
    user_based_recs,
    user_similarities,
)


def _inter(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, doc_key long, rating long"
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "value double, props string"
    )


def test_interactions_distills_and_quantizes(spark):
    ev = _events(
        spark,
        [
            (0, 1, "click", 1.25, '{"k": 7}'),
            (1, 1, "click", 2.00, '{"k": 7}'),
            (2, 1, "error", 9.99, '{"k": 7}'),  # non-interaction: dropped
            (3, 2, "view", 0.40, '{"k": 9}'),
        ],
    )
    got = {
        (r["user_id"], r["doc_key"]): r["rating"]
        for r in interactions(ev).collect()
    }
    # centi-unit quantization, error events excluded
    assert got == {(1, 7): 325, (2, 9): 40}


def test_user_cosine_hand_golden(spark):
    # u1=(3,4,0), u2=(3,4,0), u3=(0,0,5): cos(u1,u2)=1, cos(u1,u3)=0
    inter = _inter(
        spark,
        [(1, 10, 3), (1, 11, 4), (2, 10, 3), (2, 11, 4), (3, 12, 5)],
    )
    sims = {
        (r["user_id_a"], r["user_id_b"]): r["sim"]
        for r in user_similarities(inter).collect()
    }
    assert sims[(1, 2)] == pytest.approx(1.0)
    assert sims[(2, 1)] == pytest.approx(1.0)
    # zero-similarity pairs are dropped, diagonal never appears
    assert (1, 3) not in sims and (1, 1) not in sims


def test_user_based_recs_weighted_mean_and_exclusion(spark):
    # u1 and u2 share doc 10 exactly (sim 1); u2 also rated doc 20 with 7.
    # u1's rec for 20 must be the sim-weighted mean = 7; doc 10 (consumed)
    # must never be recommended back.
    inter = _inter(spark, [(1, 10, 4), (2, 10, 4), (2, 20, 7)])
    recs = {
        (r["user_id"], r["doc_key"]): (r["rec_rank"], r["score"])
        for r in user_based_recs(inter, n_neighbors=5, k=3).collect()
    }
    assert recs[(1, 20)] == (1, pytest.approx(7.0))
    assert (1, 10) not in recs
    assert (2, 10) not in recs  # u2 consumed both docs already


def test_item_cosine_and_item_recs(spark):
    # docs 10,11 co-rated by u1 with equal ratings → sim(10,11)=1 via u1;
    # u2 rated only 10, so item-CF recommends 11 to u2 with score = r_u2(10)
    inter = _inter(spark, [(1, 10, 2), (1, 11, 2), (2, 10, 6)])
    sims = {
        (r["doc_key_a"], r["doc_key_b"]): r["sim"]
        for r in item_similarities(inter).collect()
    }
    # cos(10,11) over users: d10=(2,6), d11=(2,0) → 4/(sqrt(40)*2)
    assert sims[(10, 11)] == pytest.approx(4 / (math.sqrt(40) * 2))
    recs = {
        (r["user_id"], r["doc_key"]): r["score"]
        for r in item_based_recs(inter, n_neighbors=5, k=3).collect()
    }
    # u2's vote for 11: sim(10,11)*6 / sim(10,11) = 6
    assert recs[(2, 11)] == pytest.approx(6.0)
    assert (1, 10) not in recs and (1, 11) not in recs  # both consumed


def test_n_neighbors_caps_the_pool(spark):
    # u1 identical to u2 and u3; with n_neighbors=1 only the tie-broken
    # first neighbor (user 2) contributes, so u3's exclusive doc 31
    # cannot be recommended to u1
    inter = _inter(
        spark,
        [
            (1, 10, 1),
            (2, 10, 1),
            (2, 21, 5),
            (3, 10, 1),
            (3, 31, 5),
        ],
    )
    recs = {
        (r["user_id"], r["doc_key"])
        for r in user_based_recs(inter, n_neighbors=1, k=5).collect()
    }
    assert (1, 21) in recs and (1, 31) not in recs


def test_hot_item_cap_prunes_pairing_not_norms(spark):
    # doc 10 touched by 3 users (hot), doc 11 by users 1,2 only. With
    # hot_item_cap=2 the pairing drops doc 10: u1~u2 stays (share 11),
    # u1~u3 disappears (shared only the hot doc), and the surviving sim
    # shrinks because the norms still count the hot doc's ratings.
    inter = _inter(
        spark,
        [
            (1, 10, 3),
            (2, 10, 3),
            (3, 10, 3),
            (1, 11, 4),
            (2, 11, 4),
        ],
    )
    capped = {
        (r["user_id_a"], r["user_id_b"]): r["sim"]
        for r in user_similarities(inter, hot_item_cap=2).collect()
    }
    assert (1, 3) not in capped
    # dot over doc 11 only = 16; norms keep doc 10: |u1|=|u2|=5
    assert capped[(1, 2)] == pytest.approx(16 / 25)
