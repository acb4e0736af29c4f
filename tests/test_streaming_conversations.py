"""Streamed conversation rollups ≡ the batch run of the same tree,
and both agree with the batch-native conversation_stats counters."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.entry_queries_r10 import _tr
from news_information_retrieval_system_spark.ops.transcripts import (
    conversation_stats,
)
from news_information_retrieval_system_spark.streaming.conversations import (
    conversation_stats_stream,
)

SF_DIR = "/root/testdata/sf0.001"
COUNTERS = (
    "n_turns",
    "n_user",
    "n_assistant",
    "n_tool_calls",
    "n_distinct_tools",
    "total_tokens",
    "max_turn_idx",
)


def _norm(rows):
    return sorted(
        (r["conv_id"], r["session_start"], r["session_end"])
        + tuple(r[c] for c in COUNTERS)
        for r in rows
    )


def test_streamed_conversations_equal_batch(spark, tmp_path):
    turns = _tr(spark, SF_DIR)
    inp = str(tmp_path / "turns_in")
    # split each conversation's turns across two producer files → with
    # maxFilesPerTrigger=1 the session state genuinely accumulates
    # across micro-batches before finalizing
    for i in range(2):
        turns.filter(F.col("turn_idx") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    stream = (
        spark.readStream.schema(turns.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    agg = conversation_stats_stream(stream, gap="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("conv_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = _norm(spark.sql("select * from conv_sessions").collect())
    want = _norm(conversation_stats_stream(turns, gap="10 minutes").collect())
    assert got == want and len(got) > 50


def test_single_session_matches_batch_conversation_stats(spark):
    # fixture gaps are ≤ 65 s, so a 10-minute gap yields exactly one
    # session per conversation and the counters must equal the
    # batch-native conversation_stats rollup
    turns = _tr(spark, SF_DIR)
    sessions = conversation_stats_stream(turns, gap="10 minutes")
    assert sessions.groupBy("conv_id").count().filter("count > 1").count() == 0
    got = {
        r["conv_id"]: tuple(r[c] for c in COUNTERS)
        for r in sessions.collect()
    }
    want = {
        r["conv_id"]: tuple(r[c] for c in COUNTERS)
        for r in conversation_stats(turns).collect()
    }
    assert got == want


def test_gap_splits_quiet_conversations(spark):
    # a gap shorter than the fixture's 65 s inter-turn stride must split
    # conversations into multiple sessions
    turns = _tr(spark, SF_DIR)
    sessions = conversation_stats_stream(turns, gap="30 seconds")
    multi = sessions.groupBy("conv_id").count().filter("count > 1").count()
    assert multi > 0
