"""Streaming conversation rollups over a live transcript stream.

The batch face is ``ops/transcripts.py`` conversation_stats; this is the
continuous face for an unbounded (conv_id, turn_idx, role, text, tool,
ts) turn stream — the input_hint table arriving live. A conversation in
a stream has no explicit end-marker, so finalization is temporal:
``session_window(ts, gap)`` closes a conversation's session once no new
turn arrives within ``gap``, and the watermark bounds how late a
straggler turn may still join it. State per executor is
O(open sessions), not history — the same bounded-state discipline as
streaming/analytics.py and streaming/sessions.py.

Distinct-tool counting uses size(collect_set(...)) rather than
count_distinct: exact distinct aggregation is unsupported on streaming
frames, while collect_set is an ordinary aggregate that runs identically
in batch — so the streamed ≡ batch equivalence test compares the SAME
expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_stats_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming (or batch) transcript turns → per-conversation-session
    rollup: (conv_id, session_start, session_end, n_turns, n_user,
    n_assistant, n_tool_calls, n_distinct_tools, total_tokens,
    max_turn_idx) — the conversation_stats counters, finalized when the
    conversation goes quiet for ``gap``.

    On a batch input the identical expression tree runs without state
    (withWatermark is a no-op in batch), which the equivalence test
    exploits: streamed complete-mode output must equal the batch run on
    the same rows.
    """
    s = stream.withColumn("_evt", F.col(ts_col).cast("timestamp"))
    src = s.withWatermark("_evt", watermark) if s.isStreaming else s
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
    has_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    return (
        src.groupBy("conv_id", F.session_window("_evt", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_turns"),
            F.count(F.when(F.col("role") == "user", 1)).alias("n_user"),
            F.count(F.when(F.col("role") == "assistant", 1)).alias(
                "n_assistant"
            ),
            F.count(F.when(has_tool, 1)).alias("n_tool_calls"),
            F.size(
                F.collect_set(F.when(has_tool, F.col("tool")))
            ).alias("n_distinct_tools"),
            F.sum(toks).alias("total_tokens"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
            "n_user",
            "n_assistant",
            "n_tool_calls",
            "n_distinct_tools",
            "total_tokens",
            "max_turn_idx",
        )
    )
