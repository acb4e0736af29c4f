"""Feedback-log analytics (ops/feedback.py) — semantics pinned by hand.

Reference: feedback_service.py:116-160, feedback_analytics_service.py:
102-293 (counts, per-group averages, CTR with zero-denominator → 0.0).
"""

from news_information_retrieval_system_spark.ops.feedback import (
    event_stats,
    top_docs,
    user_ctr,
)

ROWS = [
    # (event_id, user_id, event_type, value, props)
    (0, 1, "view", 1.0, '{"k": 7}'),
    (1, 1, "view", 3.0, '{"k": 8}'),
    (2, 1, "click", 2.0, '{"k": 7}'),
    (3, 2, "click", 4.0, '{"k": 7}'),
    (4, 2, "click", 0.0, '{"k": 9}'),
    (5, 3, "error", 5.0, '{"k": 7}'),
]
SCHEMA = "event_id long, user_id long, event_type string, value double, props string"


def _events(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_event_stats(spark):
    got = {
        r["event_type"]: r
        for r in event_stats(_events(spark)).collect()
    }
    assert got["click"]["n_events"] == 3
    assert got["click"]["n_users"] == 2
    assert got["click"]["n_zero"] == 1  # the value=0.0 click
    assert abs(got["click"]["avg_value"] - 2.0) < 1e-12
    assert got["view"]["n_users"] == 1
    assert set(got) == {"view", "click", "error"}


def test_top_docs_order_and_keys(spark):
    rows = top_docs(_events(spark), event_type="click", k=10).collect()
    # doc 7 has 2 clicks, doc 9 has 1; JSON key parsed to a long
    assert [(r["doc_key"], r["n_events"]) for r in rows] == [(7, 2), (9, 1)]
    assert abs(rows[0]["avg_value"] - 3.0) < 1e-12


def test_user_ctr_zero_denominator(spark):
    rows = {r["user_id"]: r for r in user_ctr(_events(spark), k=10).collect()}
    assert rows[1]["views"] == 2 and rows[1]["clicks"] == 1
    assert abs(rows[1]["ctr"] - 0.5) < 1e-12
    # user 2 clicked twice but never viewed: reference _ratio → 0.0, no error
    assert rows[2]["views"] == 0 and rows[2]["clicks"] == 2
    assert rows[2]["ctr"] == 0.0
    # user 3 has neither → 0.0
    assert rows[3]["ctr"] == 0.0
    # top-k ordering: clicks desc then user_id asc
    ordered = user_ctr(_events(spark), k=10).collect()
    assert [r["user_id"] for r in ordered] == [2, 1, 3]


def test_value_quantiles_interpolation(spark):
    from news_information_retrieval_system_spark.ops.feedback import value_quantiles

    rows = [(i, 1, "view", float(v), "{}") for i, v in enumerate([1, 2, 3, 4])]
    got = value_quantiles(
        spark.createDataFrame(rows, SCHEMA), probs=(0.5, 0.9)
    ).collect()[0]
    # linear interpolation (quantile_cont): p50 of 1..4 = 2.5, p90 = 3.7
    assert abs(got["p50"] - 2.5) < 1e-12
    assert abs(got["p90"] - 3.7) < 1e-12
