"""Search-log analytics: the operational rollups a search team watches.

Reference: src/ir_app/services/search_log_service.py:11-93 appends one
JSONL event per query (endpoint, query, latency, result_count, top
result ids) "for future feedback workflows" — the analysis side never
shipped. These are the three rollups that consume such a log: query
volume (top queries), zero-result rate (the canonical search-quality
alarm, already tracked per-model by
feedback_analytics_service.py:205-232), and the result-count
distribution.

Spark shape: each rollup is one partial-aggregating groupBy over the
log — one shuffle on a low-cardinality key, no UDFs. ``top_queries``
exports through ``orderBy().limit()`` (TakeOrdered: per-partition heaps,
k rows to the driver, never a global sort). At 100 TB the log is an
append-only date-partitioned table and every rollup here prunes to the
scanned date range before aggregating.

The log contract is a DataFrame with (query, endpoint, latency,
result_count); ``search_log_from_events`` distills that shape from the
driver's ``events`` table deterministically so both engines can derive
the identical log at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# derivation constants shared with the SQL oracle (entry_queries_r11):
# query id buckets and the result-count cycle
LOG_QUERY_MOD = 16
LOG_RESULT_MOD = 24


def search_log_from_events(
    events: DataFrame,
    props_col: str = "props",
    json_key: str = "$.k",
) -> DataFrame:
    """→ (query, endpoint, latency, result_count): a deterministic
    search-log view of the events table — the props key maps to a query
    bucket, the event type is the endpoint, the event value is the
    latency, and error events report zero results (as the reference's
    log records ``result_count`` per request)."""
    k = F.get_json_object(F.col(props_col), json_key).cast("long")
    return events.select(
        F.concat(F.lit("q"), (k % LOG_QUERY_MOD).cast("string")).alias(
            "query"
        ),
        F.col("event_type").alias("endpoint"),
        F.col("value").alias("latency"),
        F.when(F.col("event_type") == "error", F.lit(0))
        .otherwise((k % LOG_RESULT_MOD).cast("int"))
        .alias("result_count"),
    )


def query_stats(log: DataFrame) -> DataFrame:
    """→ (query, n_searches, n_zero, avg_latency): per-query volume,
    zero-result count, and mean latency — the 'top queries' payload is
    this frame ordered by n_searches."""
    return log.groupBy("query").agg(
        F.count("*").cast("long").alias("n_searches"),
        F.sum((F.col("result_count") <= 0).cast("long")).alias("n_zero"),
        F.round(F.avg("latency"), 9).alias("avg_latency"),
    )


def endpoint_zero_rates(log: DataFrame) -> DataFrame:
    """→ (endpoint, n_searches, n_zero, zero_rate): the zero-result
    alarm per endpoint. ``zero_rate`` is an exact small-integer ratio."""
    agg = log.groupBy("endpoint").agg(
        F.count("*").cast("long").alias("n_searches"),
        F.sum((F.col("result_count") <= 0).cast("long")).alias("n_zero"),
    )
    return agg.withColumn(
        "zero_rate", F.col("n_zero") / F.col("n_searches")
    )


def result_count_histogram(log: DataFrame) -> DataFrame:
    """→ (result_count, n): how many results searches return — the
    distribution the reference's ``_result_count`` field feeds."""
    return log.groupBy(
        F.col("result_count").cast("long").alias("result_count")
    ).agg(F.count("*").cast("long").alias("n"))


def search_log_digest(log: DataFrame) -> DataFrame:
    """→ (metric, key, n, n_zero, value_5dp): the three rollups stacked
    under a discriminator column so one driver slot verifies all of
    them. value_5dp carries avg latency for query rows and the zero
    rate for endpoint rows (×1e5 integer export)."""
    e5 = lambda c: F.round(c * 100000).cast("long")  # noqa: E731
    q = query_stats(log).select(
        F.lit("query").alias("metric"),
        F.col("query").alias("key"),
        F.col("n_searches").alias("n"),
        "n_zero",
        e5(F.col("avg_latency")).alias("value_5dp"),
    )
    z = endpoint_zero_rates(log).select(
        F.lit("endpoint_zero_rate").alias("metric"),
        F.col("endpoint").alias("key"),
        F.col("n_searches").alias("n"),
        "n_zero",
        e5(F.col("zero_rate")).alias("value_5dp"),
    )
    h = result_count_histogram(log).select(
        F.lit("result_count").alias("metric"),
        F.col("result_count").cast("string").alias("key"),
        F.col("n").alias("n"),
        F.lit(0).cast("long").alias("n_zero"),
        F.lit(0).cast("long").alias("value_5dp"),
    )
    return q.unionByName(z).unionByName(h)
