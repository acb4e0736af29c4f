"""Gap-based sessionization boundary semantics (ops/sessions.py)."""

from datetime import datetime

from news_information_retrieval_system_spark.ops.sessions import (
    session_stats,
    sessionize,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_boundary_is_inclusive(spark):
    rows = [
        (0, 1, datetime(2024, 1, 1, 12, 0, 0), 1.0),
        (1, 1, datetime(2024, 1, 1, 12, 30, 0), 1.0),  # exactly 30 min: SAME session
        (2, 1, datetime(2024, 1, 1, 13, 0, 1), 1.0),  # 30min+1s: NEW session
        (3, 2, datetime(2024, 1, 1, 12, 0, 0), 1.0),  # other user: own session 0
    ]
    got = {
        r["event_id"]: (r["session_seq"], r["session_id"])
        for r in sessionize(_ev(spark, rows), gap_minutes=30).collect()
    }
    assert got[0] == (0, "1-0")
    assert got[1] == (0, "1-0")
    assert got[2] == (1, "1-1")
    assert got[3] == (0, "2-0")


def test_ts_ties_ordered_by_event_id(spark):
    rows = [
        (1, 1, T0, 1.0),
        (0, 1, T0, 1.0),  # same ts — event_id orders them, one session
    ]
    out = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    assert {r["session_seq"] for r in out} == {0}


def test_session_stats_rollup(spark):
    rows = [
        (0, 1, datetime(2024, 1, 1, 12, 0, 0), 2.0),
        (1, 1, datetime(2024, 1, 1, 12, 10, 0), 3.0),
        (2, 1, datetime(2024, 1, 1, 14, 0, 0), 5.0),
    ]
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(_ev(spark, rows), gap_minutes=30).collect()
    }
    s0 = got[(1, 0)]
    assert s0["n_events"] == 2 and s0["duration_sec"] == 600
    assert abs(s0["total_value"] - 5.0) < 1e-12
    s1 = got[(1, 1)]
    assert s1["n_events"] == 1 and s1["duration_sec"] == 0
