"""Driver-contract entries for feedback/interaction-log analytics.

Reference parity targets: feedback_service.py:116-160 (stats payload)
and feedback_analytics_service.py:102-293 (top clicked docs, per-group
count/avg/zero metrics, CTR ratios) — the batch-analytics face of the
reference's feedback log, computed over the driver's ``events`` table
instead of the reference's SQLite event store.

Output discipline matches the other batches: averaged/ratio floats are
exported as ``*_5dp`` bigints so the DuckDB comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_DOCS_K = 10
CTR_K = 20


def _e5(col: str, alias: str):
    return F.round(F.col(col) * 100000).cast("long").alias(alias)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_feedback_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.feedback import event_stats

    out = event_stats(_events(spark, sf_dir))
    return out.select(
        "event_type",
        "n_events",
        "n_users",
        "n_zero",
        _e5("avg_value", "avg_value_5dp"),
    ).orderBy("event_type")


def q_feedback_top_clicked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.feedback import top_docs

    out = top_docs(_events(spark, sf_dir), event_type="click", k=TOP_DOCS_K)
    return out.select(
        "doc_key", "n_events", _e5("avg_value", "avg_value_5dp")
    )


def q_feedback_user_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.feedback import user_ctr

    out = user_ctr(_events(spark, sf_dir), k=CTR_K)
    return out.select("user_id", "views", "clicks", _e5("ctr", "ctr_5dp"))


def q_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value percentiles (p50/p90/p99); Spark `percentile`
    interpolates identically to DuckDB `quantile_cont`."""
    from .ops.feedback import value_quantiles

    out = value_quantiles(_events(spark, sf_dir), probs=(0.5, 0.9, 0.99))
    return out.select(
        "event_type",
        _e5("p50", "p50_5dp"),
        _e5("p90", "p90_5dp"),
        _e5("p99", "p99_5dp"),
    ).orderBy("event_type")


WINDOW_HOURS = 6


def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of streaming/analytics.windowed_event_counts (the same
    expression tree the streamed complete-mode test pins): tumbling
    6-hour per-type rollups. Window starts exported as epoch seconds;
    Spark's epoch-aligned window ≡ DuckDB time_bucket for day-dividing
    widths (both origins are midnight UTC)."""
    from .streaming.analytics import windowed_event_counts

    out = windowed_event_counts(
        _events(spark, sf_dir), window_duration=f"{WINDOW_HOURS} hours"
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "event_type",
        "n_events",
        _e5("total_value", "total_value_5dp"),
    )


SESSION_GAP_MIN = 240  # driver events are hours apart per user; a gap this
# size yields real multi-event sessions (≈30% grouping at sf0.01), so the
# oracle exercises the cumulative-sum assignment, not just the lag flag


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (ops/sessions.py): per-session event
    count, duration, summed value. Window lag + cumulative sum — the
    DuckDB oracle replays the identical window algebra."""
    from .ops.sessions import session_stats

    out = session_stats(_events(spark, sf_dir), gap_minutes=SESSION_GAP_MIN)
    return out.select(
        "user_id",
        "session_seq",
        "n_events",
        "duration_sec",
        _e5("total_value", "total_value_5dp"),
    )


ORACLES: dict[str, str] = {}

ORACLES["feedback_event_stats"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(round(avg(value) * 100000) AS BIGINT) AS avg_value_5dp
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["feedback_top_clicked"] = f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(avg(value) * 100000) AS BIGINT) AS avg_value_5dp
FROM events
WHERE event_type = 'click'
GROUP BY 1
ORDER BY n_events DESC, doc_key ASC
LIMIT {TOP_DOCS_K}
"""

ORACLES["feedback_user_ctr"] = f"""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(round(
         CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
              THEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE
                   / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              ELSE 0.0 END * 100000) AS BIGINT) AS ctr_5dp
FROM events
GROUP BY user_id
ORDER BY clicks DESC, user_id ASC
LIMIT {CTR_K}
"""


ORACLES["session_stats"] = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM ordered
), sess AS (
  SELECT *,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
  FROM flagged
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec,
       CAST(round(sum(value) * 100000) AS BIGINT) AS total_value_5dp
FROM sess
GROUP BY user_id, session_seq
"""


ORACLES["event_value_quantiles"] = """
SELECT event_type,
       CAST(round(quantile_cont(value, 0.5) * 100000) AS BIGINT) AS p50_5dp,
       CAST(round(quantile_cont(value, 0.9) * 100000) AS BIGINT) AS p90_5dp,
       CAST(round(quantile_cont(value, 0.99) * 100000) AS BIGINT) AS p99_5dp
FROM events
GROUP BY event_type
ORDER BY event_type
"""


ORACLES["windowed_event_counts"] = f"""
SELECT CAST(floor(epoch(time_bucket(INTERVAL {WINDOW_HOURS} HOURS, ts))) AS BIGINT)
         AS window_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 100000) AS BIGINT) AS total_value_5dp
FROM events
GROUP BY 1, 2
"""


def registry():
    return {
        "feedback_event_stats": q_feedback_event_stats,
        "feedback_top_clicked": q_feedback_top_clicked,
        "feedback_user_ctr": q_feedback_user_ctr,
        "event_value_quantiles": q_event_value_quantiles,
        "windowed_event_counts": q_windowed_event_counts,
        "session_stats": q_session_stats,
    }
