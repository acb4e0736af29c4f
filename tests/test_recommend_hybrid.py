"""Hybrid recommender (ops/recommend_hybrid.py): popularity shares,
history-mean content scores, and the weighted blend on hand goldens."""

import pytest

from news_information_retrieval_system_spark.ops.recommend_hybrid import (
    content_scores,
    hybrid_weighted,
    item_popularity,
)


def _inter(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, doc_key long, rating long"
    )


def test_item_popularity_share(spark):
    inter = _inter(spark, [(1, 10, 5), (2, 10, 5), (2, 11, 5), (3, 12, 5)])
    got = {
        r["doc_key"]: r["popularity"]
        for r in item_popularity(inter).collect()
    }
    assert got[10] == pytest.approx(2 / 3)
    assert got[11] == pytest.approx(1 / 3)


def test_content_scores_mean_over_history(spark):
    inter = _inter(spark, [(1, 10, 5), (1, 11, 5)])
    # identical-weight docs: cos(10,12)=1, cos(11,12)=1 → mean 1; the
    # consumed docs 10/11 must not appear as candidates
    w = spark.createDataFrame(
        [(10, "a", 1.0), (11, "a", 1.0), (12, "a", 1.0)],
        "doc_id long, term string, w_norm double",
    )
    got = {
        (r["user_id"], r["doc_key"]): r["content_score"]
        for r in content_scores(inter, w).collect()
    }
    assert got == {(1, 12): pytest.approx(1.0)}


def test_hybrid_blend_normalizes_per_user(spark):
    cf = spark.createDataFrame(
        [(1, 20, 8.0), (1, 21, 4.0)], "user_id long, doc_key long, score double"
    )
    content = spark.createDataFrame(
        [(1, 21, 0.5)], "user_id long, doc_key long, content_score double"
    )
    pop = spark.createDataFrame(
        [(20, 0.5), (21, 1.0)], "doc_key long, popularity double"
    )
    got = {
        r["doc_key"]: (r["rec_rank"], r["score"])
        for r in hybrid_weighted(
            cf, content, pop, w_content=0.4, w_cf=0.4, w_pop=0.2, k=5
        ).collect()
    }
    # doc 20: cf 8/8=1 → 0.4·0 + 0.4·1 + 0.2·0.5 = 0.5
    # doc 21: content 0.5/0.5=1, cf 4/8 → 0.4·1 + 0.4·0.5 + 0.2·1 = 0.8
    assert got[21] == (1, pytest.approx(0.8))
    assert got[20] == (2, pytest.approx(0.5))


def test_hybrid_missing_source_contributes_zero(spark):
    cf = spark.createDataFrame(
        [], "user_id long, doc_key long, score double"
    )
    content = spark.createDataFrame(
        [(7, 30, 0.25)], "user_id long, doc_key long, content_score double"
    )
    pop = spark.createDataFrame([], "doc_key long, popularity double")
    rows = hybrid_weighted(cf, content, pop, k=3).collect()
    assert len(rows) == 1
    # only content fires: 0.4 · (0.25/0.25) = 0.4
    assert rows[0]["score"] == pytest.approx(0.4)


def test_cf_mean_item_sims_dense_denominator(spark):
    from news_information_retrieval_system_spark.ops.recommend_hybrid import (
        cf_mean_item_sims,
    )

    inter = _inter(spark, [(1, 10, 5), (1, 11, 5)])
    # candidate 20 is similar only to doc 10 (sim 0.8); the mean must
    # divide by BOTH consumed items (dense-row mean), giving 0.4
    sims = spark.createDataFrame(
        [(20, 10, 0.8)], "doc_key_a long, doc_key_b long, sim double"
    )
    rows = cf_mean_item_sims(inter, sims).collect()
    assert len(rows) == 1
    assert rows[0]["doc_key"] == 20
    assert rows[0]["cf_score"] == pytest.approx(0.4)


def test_cascade_blend_branches(spark):
    from news_information_retrieval_system_spark.ops.recommend_hybrid import (
        cascade_recs,
    )

    content = spark.createDataFrame(
        [(1, 20, 0.5), (1, 21, 0.5)],
        "user_id long, doc_key long, content_score double",
    )
    cf_mean = spark.createDataFrame(
        [(1, 20, 0.6)], "user_id long, doc_key long, cf_score double"
    )
    pop = spark.createDataFrame(
        [(20, 1.0), (21, 1.0)], "doc_key long, popularity double"
    )
    got = {
        r["doc_key"]: r["score"]
        for r in cascade_recs(content, cf_mean, pop, pool=10, k=5).collect()
    }
    # doc 20 has CF evidence: 0.7·0.6 + 0.2·0.5 + 0.1·1 = 0.62
    # doc 21 has none:        0.8·0.5 + 0.2·1 = 0.6
    assert got[20] == pytest.approx(0.62)
    assert got[21] == pytest.approx(0.6)


def test_cascade_pool_truncates_recall(spark):
    from news_information_retrieval_system_spark.ops.recommend_hybrid import (
        cascade_recs,
    )

    content = spark.createDataFrame(
        [(1, 20, 0.9), (1, 21, 0.1)],
        "user_id long, doc_key long, content_score double",
    )
    # huge CF evidence on the low-content doc — but pool=1 cuts it
    # BEFORE the re-rank (cascade recall is content's job)
    cf_mean = spark.createDataFrame(
        [(1, 21, 1.0)], "user_id long, doc_key long, cf_score double"
    )
    pop = spark.createDataFrame([], "doc_key long, popularity double")
    got = [r["doc_key"] for r in cascade_recs(content, cf_mean, pop, pool=1, k=5).collect()]
    assert got == [20]


def test_switching_routes_by_interaction_count(spark):
    from news_information_retrieval_system_spark.ops.recommend_hybrid import (
        switching_recs,
    )

    # user 1 has 2 interactions (light), user 2 has 3 (experienced)
    inter = _inter(
        spark, [(1, 10, 5), (1, 11, 5), (2, 10, 5), (2, 11, 5), (2, 12, 5)]
    )
    cf = spark.createDataFrame(
        [(1, 30, 9.0), (2, 30, 9.0)],
        "user_id long, doc_key long, score double",
    )
    content = spark.createDataFrame(
        [(1, 40, 0.5), (2, 40, 0.5)],
        "user_id long, doc_key long, content_score double",
    )
    pop = spark.createDataFrame([(40, 0.5)], "doc_key long, popularity double")
    rows = switching_recs(
        inter, cf, content, pop, min_cf_interactions=3, k=5
    ).collect()
    got = {(r["user_id"], r["doc_key"]): (r["method"], r["score"]) for r in rows}
    # experienced user 2 → pure CF branch only
    assert got[(2, 30)] == ("cf", pytest.approx(9.0))
    assert (2, 40) not in got
    # light user 1 → content+pop branch only: 0.7·0.5 + 0.3·0.5 = 0.5
    assert got[(1, 40)] == ("content_pop", pytest.approx(0.5))
    assert (1, 30) not in got
