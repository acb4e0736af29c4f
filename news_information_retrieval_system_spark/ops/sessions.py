"""Event sessionization + session analytics over the interaction log.

A standard training-pipeline op the engine's event tables need at scale
(the reference's feedback log keys events by session_id directly —
feedback_service.py:34-46 — because its web layer hands sessions to it;
a batch log has to *derive* them from timestamps).

Semantics: classic gap-based sessionization — within each user, an event
starts a new session when it arrives more than ``gap_minutes`` after the
previous event. Session ids are deterministic: (user_id, index of the
session among that user's sessions, 0-based).

Scale shape: one shuffle on user_id (the window partition key); the
new-session flag is lag() + cumulative sum inside the partition — no
UDFs, no state store, whole-stage codegen end to end. Skewed power
users are bounded by their own event count (a window over one user's
events), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events + (session_seq, session_id) — gap-based session assignment.

    Ties on ts within a user are ordered by event_id when present (the
    driver log carries one) so the assignment is total and deterministic.
    """
    order_cols = [F.asc(ts_col)]
    if "event_id" in events.columns:
        order_cols.append(F.asc("event_id"))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s)
    ).cast("long")
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    ).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq")),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup → (user_id, session_seq, n_events,
    duration_sec, total_value): event count, wall span, summed value."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return s.groupBy(F.col(user_col).alias("user_id"), "session_seq").agg(
        F.count("*").cast("long").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("duration_sec"),
        F.sum(value_col).alias("total_value"),
    )
