"""Feedback/interaction-log analytics (reference feedback services).

Reference: src/ir_app/services/feedback_service.py:116-160 (``stats()``:
event totals, top clicked docs) and
src/ir_app/services/feedback_analytics_service.py:102-293 (top queries
with avg latency, top clicked docs, per-model search/click/CTR/zero-result
metrics, relevance-grade distribution, session counts). The reference
stores events in SQLite and aggregates with per-request SQL; here the
event log is a parquet/Iceberg table (the driver's ``events`` shape:
event_id, ts, user_id, event_type, value, props-JSON) and each payload is
one declarative aggregation.

Scale shape: every function below is a single groupBy with partial
(map-side) aggregation — one shuffle on the group key, no UDFs, no
driver-side loops. ``countDistinct`` runs as the standard two-stage
expand/agg; top-k exports go through ``orderBy(...).limit(k)`` which
Spark executes as TakeOrdered (per-partition heaps + driver merge of k
rows, never a global sort materialization). JSON fields come out via
``get_json_object`` (JVM, codegen) — at 100 TB the log stays columnar
and the props blob is only parsed for the rows that survive the
event-type filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_stats(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-event-type rollup → (event_type, n_events, n_users, n_zero,
    avg_value).

    Mirrors ``FeedbackService.stats()`` totals (feedback_service.py:
    124-133) generalized over event types, plus ``_model_metrics``'s
    count / avg-latency / zero-result columns (feedback_analytics_
    service.py:205-232) with ``value`` standing in for latency and
    ``n_users`` for the session count (:334-358).
    """
    return events.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct(user_col).cast("long").alias("n_users"),
        F.sum((F.col(value_col) <= 0).cast("long")).alias("n_zero"),
        F.avg(value_col).alias("avg_value"),
    )


def top_docs(
    events: DataFrame,
    event_type: str = "click",
    json_key: str = "$.k",
    k: int = 10,
    type_col: str = "event_type",
    props_col: str = "props",
    value_col: str = "value",
) -> DataFrame:
    """Most-interacted documents → (doc_key, n_events, avg_value), top-k
    by count desc then doc_key asc.

    Mirrors ``stats()`` top_clicked_docs (feedback_service.py:143-151)
    and ``_top_clicked_docs`` (feedback_analytics_service.py:170-204);
    the doc identifier lives in the event's JSON props payload, as the
    reference's doc_id/article_id live in the feedback row.
    """
    return (
        events.filter(F.col(type_col) == event_type)
        .select(
            F.get_json_object(props_col, json_key).cast("long").alias("doc_key"),
            F.col(value_col).alias("_v"),
        )
        .filter(F.col("doc_key").isNotNull())  # events without the id prop
        # carry no doc to rank; dropping them also keeps Spark's
        # nulls-first ASC from diverging from SQL's NULLS LAST default
        .groupBy("doc_key")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.avg("_v").alias("avg_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("doc_key"))
        .limit(k)
    )


def value_quantiles(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-event-type value quantiles → (event_type, p50, p90, ...).

    The latency-percentile face of ``_model_metrics``' avg-latency
    column (feedback_analytics_service.py:205-232) — averages hide tail
    behavior, percentiles are what an operator actually watches. EXACT
    ``percentile`` (linear interpolation, ≡ SQL ``quantile_cont``) so the
    result is oracle-checkable; at 100 TB swap in ``approx_percentile``
    — same call shape, sketch-mergeable, no exact global sort.
    """
    aggs = [
        F.percentile(value_col, F.lit(p)).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return events.groupBy(F.col(type_col).alias("event_type")).agg(*aggs)


def user_ctr(
    events: DataFrame,
    click_type: str = "click",
    view_type: str = "view",
    k: int = 20,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user click-through → (user_id, views, clicks, ctr), top-k by
    clicks desc then user_id asc.

    Mirrors the CTR ratio of ``analytics()`` (feedback_analytics_
    service.py:73, clicks/searches) and the per-group CTR attached in
    ``_model_metrics`` (:255-266), grouped per user; like the
    reference's ``_ratio``, a zero denominator yields 0.0 rather than
    an error. One conditional aggregation — no join between the click
    and view subsets.
    """
    is_click = (F.col(type_col) == click_type).cast("long")
    is_view = (F.col(type_col) == view_type).cast("long")
    agg = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.sum(is_view).alias("views"),
        F.sum(is_click).alias("clicks"),
    )
    return (
        agg.select(
            "user_id",
            "views",
            "clicks",
            F.when(F.col("views") > 0, F.col("clicks") / F.col("views"))
            .otherwise(F.lit(0.0))
            .alias("ctr"),
        )
        .orderBy(F.desc("clicks"), F.asc("user_id"))
        .limit(k)
    )
