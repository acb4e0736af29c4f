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


def registry():
    return {
        "feedback_event_stats": q_feedback_event_stats,
        "feedback_top_clicked": q_feedback_top_clicked,
        "feedback_user_ctr": q_feedback_user_ctr,
    }
