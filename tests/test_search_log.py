"""Search-log analytics (ops/search_log.py): derived log shape and the
three rollups on hand-computed fixtures."""

import pytest

from news_information_retrieval_system_spark.ops.search_log import (
    endpoint_zero_rates,
    query_stats,
    result_count_histogram,
    search_log_digest,
    search_log_from_events,
)


def _events(spark):
    rows = [
        # (event_id, user, type, value, props)  k%16 → query, k%24 → results
        (0, 1, "click", 10.0, '{"k": 3}'),
        (1, 2, "click", 30.0, '{"k": 3}'),
        (2, 3, "view", 5.0, '{"k": 19}'),  # q3 again (19%16), 19 results
        (3, 4, "error", 1.0, '{"k": 5}'),  # zero results by definition
        (4, 5, "view", 2.0, '{"k": 48}'),  # 48%24=0 → organic zero-result
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "value double, props string"
    )


def _log(spark):
    return search_log_from_events(_events(spark))


def test_log_derivation(spark):
    rows = {
        (r["query"], r["endpoint"], r["latency"], r["result_count"])
        for r in _log(spark).collect()
    }
    assert ("q3", "click", 10.0, 3) in rows
    assert ("q3", "view", 5.0, 19) in rows
    assert ("q5", "error", 1.0, 0) in rows  # error forces zero results
    assert ("q0", "view", 2.0, 0) in rows  # 48 % 24 == 0


def test_query_stats(spark):
    got = {r["query"]: r for r in query_stats(_log(spark)).collect()}
    assert got["q3"]["n_searches"] == 3
    assert got["q3"]["n_zero"] == 0
    assert got["q3"]["avg_latency"] == pytest.approx(15.0)
    assert got["q0"]["n_zero"] == 1


def test_endpoint_zero_rates(spark):
    got = {r["endpoint"]: r for r in endpoint_zero_rates(_log(spark)).collect()}
    assert got["error"]["zero_rate"] == pytest.approx(1.0)
    assert got["view"]["n_searches"] == 2
    assert got["view"]["zero_rate"] == pytest.approx(0.5)
    assert got["click"]["zero_rate"] == 0.0


def test_result_count_histogram(spark):
    got = {
        r["result_count"]: r["n"]
        for r in result_count_histogram(_log(spark)).collect()
    }
    assert got == {3: 2, 19: 1, 0: 2}


def test_digest_stacks_all_three(spark):
    rows = search_log_digest(_log(spark)).collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r["metric"], []).append(r)
    assert len(by_metric["query"]) == 3  # q3, q5, q0
    assert len(by_metric["endpoint_zero_rate"]) == 3
    assert len(by_metric["result_count"]) == 3
    q3 = next(r for r in by_metric["query"] if r["key"] == "q3")
    assert q3["value_5dp"] == 1500000  # avg latency 15.0 × 1e5
    err = next(
        r for r in by_metric["endpoint_zero_rate"] if r["key"] == "error"
    )
    assert err["value_5dp"] == 100000  # zero rate 1.0 × 1e5
