"""Tests for eval.significance (paired tests, PR curve) and ops.audit.

Expected values are hand-computed (the t-test and Wilcoxon cases follow
the worked examples in any stats text; no scipy in this environment).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.eval.significance import (
    interpolated_pr,
    paired_deltas,
    paired_sig_test,
)
from news_information_retrieval_system_spark.ops.audit import (
    dedup_stats,
    field_completeness,
    value_distribution,
)


def _metric_df(spark, vals: dict[str, float]):
    return spark.createDataFrame(
        [(q, v) for q, v in vals.items()], "query_id string, m double"
    )


def test_paired_deltas_exact_ints(spark):
    a = _metric_df(spark, {"q1": 0.5, "q2": 0.25, "q3": 0.1})
    b = _metric_df(spark, {"q1": 0.4, "q2": 0.25, "q4": 0.9})
    rows = {r["query_id"]: r for r in paired_deltas(a, b, "m").collect()}
    # intersection only; deltas are quantized-integer exact
    assert set(rows) == {"q1", "q2"}
    assert rows["q1"]["d"] == 10000
    assert rows["q2"]["d"] == 0


def test_paired_sig_test_hand_computed(spark):
    # deltas (x1e5): +10000, -5000, +20000, 0, +5000
    a = _metric_df(spark, {"q1": 0.6, "q2": 0.2, "q3": 0.9, "q4": 0.5, "q5": 0.30})
    b = _metric_df(spark, {"q1": 0.5, "q2": 0.25, "q3": 0.7, "q4": 0.5, "q5": 0.25})
    row = paired_sig_test(a, b, "m").collect()[0]
    assert row["n_queries"] == 5
    assert (row["wins"], row["losses"], row["ties"]) == (3, 1, 1)
    d = [10000, -5000, 20000, 0, 5000]
    n = len(d)
    mean = sum(d) / n
    var = sum((x - mean) ** 2 for x in d) / (n - 1)
    t = mean / math.sqrt(var / n)
    assert row["mean_delta_5dp"] == round(mean)
    assert row["t_stat_5dp"] == pytest.approx(round(t * 100000), abs=1)
    # Wilcoxon over nonzero deltas {10000:-> |d| rank 3; -5000,5000 tie at
    # midrank 1.5; 20000 rank 4}: W+ = 1.5 + 3 + 4 = 8.5, W- = 1.5
    assert row["n_nonzero"] == 4
    assert row["w_plus_x2"] == 17
    assert row["w_minus_x2"] == 3
    mu = 4 * 5 / 4
    sig = math.sqrt(4 * 5 * 9 / 24)
    assert row["wilcoxon_z_5dp"] == pytest.approx(
        round((8.5 - mu) / sig * 100000), abs=1
    )


def test_paired_sig_test_degenerate_all_ties(spark):
    a = _metric_df(spark, {"q1": 0.5, "q2": 0.25})
    row = paired_sig_test(a, a, "m").collect()[0]
    assert row["ties"] == 2 and row["wins"] == 0 and row["losses"] == 0
    assert row["t_stat_5dp"] is None  # zero variance
    assert row["n_nonzero"] == 0 and row["wilcoxon_z_5dp"] is None


def test_interpolated_pr(spark):
    # one query, 4 retrieved, hits at ranks 1 and 3, n_rel=2 →
    # recall after each rank: .5, .5, 1.0, 1.0; precision: 1, .5, 2/3, .5
    ranked = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([11, 12, 13, 14], start=1)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 1)], "query_id string, doc_id long, rel int"
    )
    out = {
        r["recall_pct"]: r["p_interp_5dp"]
        for r in interpolated_pr(ranked, qrels).collect()
    }
    assert len(out) == 11
    # p_interp(r<=0.5) = max prec at recall>=r = 1.0; p_interp(r>0.5) = 2/3
    for pct in (0, 10, 20, 30, 40, 50):
        assert out[pct] == 100000
    for pct in (60, 70, 80, 90, 100):
        assert out[pct] == round(2 / 3 * 100000)


def test_interpolated_pr_unreached_levels_zero(spark):
    # only 1 of 2 relevant docs retrieved → levels > 50% are 0.0
    ranked = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 12, 2)], "query_id string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 99, 1)], "query_id string, doc_id long, rel int"
    )
    out = {
        r["recall_pct"]: r["p_interp_5dp"]
        for r in interpolated_pr(ranked, qrels).collect()
    }
    assert out[50] == 100000 and out[60] == 0 and out[100] == 0


AUDIT_ROWS = [
    # (title, content, url)
    ("t1", "long enough content here", "u1"),
    ("", "more content", "u2"),      # missing title
    (None, "even more", "u3"),       # missing title
    ("t4", "", "u4"),                # missing content
    ("t5", "c5", None),              # missing url
]


def test_field_completeness(spark):
    df = spark.createDataFrame(AUDIT_ROWS, "title string, content string, url string")
    rows = {r["field"]: r for r in field_completeness(df, ["title", "content", "url"]).collect()}
    t = rows["title"]
    assert (t["present"], t["missing"]) == (3, 2)
    assert t["coverage_5dp"] == 60000 and t["status"] == "needs_work"
    # mean len over ALL rows, missing as 0: (2+0+0+2+2)/5 = 1.2
    assert t["mean_len_5dp"] == 120000 and t["max_len"] == 2
    c = rows["content"]
    assert c["present"] == 4 and c["status"] == "watch"
    u = rows["url"]
    assert u["coverage_5dp"] == 80000 and u["status"] == "watch"


def test_field_completeness_status_good(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(20)], "title string")
    row = field_completeness(df, ["title"]).collect()[0]
    assert row["status"] == "good" and row["coverage_5dp"] == 100000


def test_value_distribution_missing_bucket(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("",), (None,)], "src string"
    )
    rows = value_distribution(df, "src", limit=2).collect()
    assert [(r["value"], r["count"]) for r in rows] == [("a", 2), ("missing", 2)]
    assert rows[0]["ratio_5dp"] == 40000


def test_dedup_stats(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    row = dedup_stats(df).collect()[0]
    assert (row["dedup_hashes"], row["unique_hashes"], row["duplicate_hashes"]) == (3, 2, 1)


def test_mi_patterns_hand_computed(spark):
    from news_information_retrieval_system_spark.ops.patterns import mi_patterns

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = mi_patterns(docs, n_min=2, n_max=3, min_freq=2).collect()
    # only "a b" survives min_freq=2: freq 3; N=7, f_a=3, f_b=3
    assert len(rows) == 1
    r = rows[0]
    assert (r["pattern"], r["n"], r["freq"]) == ("a b", 2, 3)
    assert r["mi_5dp"] == round(math.log2(3 * 7 / (3 * 3)) * 100000)


def test_mi_patterns_repeated_token(spark):
    from news_information_retrieval_system_spark.ops.patterns import mi_patterns

    # "x x" pattern: repeated token counted per occurrence in the product
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x x z")], "doc_id long, text string"
    )
    rows = {r["pattern"]: r for r in mi_patterns(docs, 2, 2, min_freq=2).collect()}
    # N=6, f_x=4; "x x" freq 2 -> MI = log2(2*6/(4*4))
    assert rows["x x"]["mi_5dp"] == round(math.log2(2 * 6 / 16) * 100000)
