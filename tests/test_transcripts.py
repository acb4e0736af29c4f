"""Conversation-grain operators (ops/transcripts.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.transcripts import (
    conversation_dedup,
    conversation_durations,
    conversation_fingerprints,
    conversation_rank,
    conversation_stats,
    sft_pairs,
    tool_transitions,
)

TURNS = [
    # (conv_id, turn_idx, role, text, tool)
    ("c1", 0, "user", "hello there", ""),
    ("c1", 1, "assistant", "hi how can i help", ""),
    ("c1", 2, "user", "find a fast index", ""),
    ("c1", 3, "assistant", "searching now", "search"),
    ("c2", 0, "user", "hello there", ""),
    ("c2", 1, "assistant", "hi how can i help", ""),
    # c3 ≡ c1 turn-for-turn (whole-conversation duplicate)
    ("c3", 0, "user", "hello there", ""),
    ("c3", 1, "assistant", "hi how can i help", ""),
    ("c3", 2, "user", "find a fast index", ""),
    ("c3", 3, "assistant", "searching now", "search"),
    # c4: same texts as c2 but roles flipped — NOT a duplicate
    ("c4", 0, "assistant", "hello there", ""),
    ("c4", 1, "user", "hi how can i help", ""),
]

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _turns(spark):
    return spark.createDataFrame(TURNS, SCHEMA)


def test_conversation_stats(spark):
    stats = {
        r.conv_id: r.asDict() for r in conversation_stats(_turns(spark)).collect()
    }
    c1 = stats["c1"]
    assert c1["n_turns"] == 4
    assert c1["n_user"] == 2 and c1["n_assistant"] == 2
    assert c1["n_tool_calls"] == 1 and c1["n_distinct_tools"] == 1
    assert c1["total_tokens"] == 2 + 5 + 4 + 2
    assert c1["max_turn_idx"] == 3
    assert stats["c2"]["n_tool_calls"] == 0
    assert stats["c2"]["n_distinct_tools"] == 0


def test_sft_pairs_context_window(spark):
    pairs = {
        (r.conv_id, r.turn_idx): (r.prompt, r.response)
        for r in sft_pairs(_turns(spark), context_turns=2).collect()
    }
    assert pairs[("c1", 1)] == ("user: hello there", "hi how can i help")
    # only the previous 2 turns enter the prompt
    assert pairs[("c1", 3)] == (
        "assistant: hi how can i help\nuser: find a fast index",
        "searching now",
    )
    # c4's assistant turn 0 has no context → dropped
    assert ("c4", 0) not in pairs
    # non-assistant turns never become examples
    assert all(k[1] in (1, 3) for k in pairs if k[0] in ("c1", "c3"))


def test_conversation_dedup_groups(spark):
    out = {r.conv_id: r.asDict() for r in conversation_dedup(_turns(spark)).collect()}
    assert out["c1"]["conv_hash"] == out["c3"]["conv_hash"]
    assert out["c3"]["canonical_conv_id"] == "c1" and out["c3"]["is_dup"] == 1
    assert out["c1"]["is_dup"] == 0
    # role flip changes the fingerprint
    assert out["c4"]["conv_hash"] != out["c2"]["conv_hash"]
    assert out["c2"]["is_dup"] == 0 and out["c4"]["is_dup"] == 0


def test_conversation_rank_maxp_sump(spark):
    # hand-built turn scores: c1 has one strong turn, c2 two medium ones
    scores = spark.createDataFrame(
        [
            ("q1", 10, 5.0),  # doc 10 ∈ c1
            ("q1", 11, 0.5),  # doc 11 ∈ c1
            ("q1", 20, 3.0),  # doc 20 ∈ c2
            ("q1", 21, 3.0),  # doc 21 ∈ c2
        ],
        "query_id string, doc_id int, score double",
    )
    conv = spark.createDataFrame(
        [(10, "c1"), (11, "c1"), (20, "c2"), (21, "c2")],
        "doc_id int, conv_id string",
    )
    maxp = {
        r.conv_id: (r.rank, r.score, r.n_matching_turns)
        for r in conversation_rank(scores, conv, k=5, method="maxp").collect()
    }
    # MaxP: c1 wins on its single 5.0 turn
    assert maxp["c1"] == (1, 5.0, 2) and maxp["c2"] == (2, 3.0, 2)
    sump = {
        r.conv_id: (r.rank, r.score)
        for r in conversation_rank(scores, conv, k=5, method="sump").collect()
    }
    # SumP: c2's 3+3 beats c1's 5+0.5
    assert sump["c2"] == (1, 6.0) and sump["c1"] == (2, 5.5)
    with pytest.raises(ValueError):
        conversation_rank(scores, conv, method="meanp")


def test_conversation_rank_decay(spark):
    from news_information_retrieval_system_spark.ops.transcripts import (
        conversation_rank_decay,
    )

    scores = spark.createDataFrame(
        [
            ("q1", 10, 1.0),   # c1 turn 0 (age 1 → ×1/2)
            ("q1", 11, 2.0),   # c1 turn 1 = last (age 0 → ×1)
            ("q1", 20, 2.4),   # c2 turn 0 = last (age 0 → ×1)
        ],
        "query_id string, doc_id int, score double",
    )
    conv = spark.createDataFrame(
        [(10, "c1", 0), (11, "c1", 1), (20, "c2", 0)],
        "doc_id int, conv_id string, turn_idx int",
    )
    got = {
        r.conv_id: (r.rank, r.score, r.n_matching_turns)
        for r in conversation_rank_decay(scores, conv, k=5).collect()
    }
    # c1 = 1.0/2 + 2.0 = 2.5 beats c2 = 2.4; halving weights are exact
    assert got["c1"] == (1, 2.5, 2)
    assert got["c2"] == (2, 2.4, 1)

    # every conversation's only matching turn at its last index →
    # decay ≡ SumP ≡ MaxP (weight 2^0 = 1 everywhere)
    one = scores.filter(F.col("doc_id") != 10)
    decay = {
        (r.conv_id): r.score
        for r in conversation_rank_decay(one, conv, k=5).collect()
    }
    sump = {
        (r.conv_id): r.score
        for r in conversation_rank(
            one, conv.select("doc_id", "conv_id"), k=5, method="sump"
        ).collect()
    }
    assert decay == sump


def test_tool_transitions_skip_non_tool_turns(spark):
    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "x", ""),
            ("c1", 1, "assistant", "x", "search"),
            ("c1", 2, "user", "x", ""),  # skipped: not a tool call
            ("c1", 3, "assistant", "x", "python"),
            ("c1", 4, "assistant", "x", "python"),
            ("c2", 0, "assistant", "x", "search"),
            ("c2", 1, "assistant", "x", "python"),
        ],
        SCHEMA,
    )
    out = {
        (r.prev_tool, r.tool): (r.n_transitions, r.n_conversations)
        for r in tool_transitions(turns).collect()
    }
    # search→python bridges c1's non-tool turn 2, and occurs in both convs
    assert out[("search", "python")] == (2, 2)
    assert out[("python", "python")] == (1, 1)
    assert len(out) == 2  # no transition crosses a conversation boundary


def test_conversation_durations(spark):
    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "x", "", "2026-01-01 00:00:00"),
            ("c1", 1, "assistant", "x", "", "2026-01-01 00:00:10"),
            ("c1", 2, "user", "x", "", "2026-01-01 00:01:10"),
            ("c2", 0, "user", "x", "", "2026-01-01 00:00:00"),
        ],
        SCHEMA + ", ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str"))
    out = {r.conv_id: r.asDict() for r in conversation_durations(turns).collect()}
    assert out["c1"]["duration_s"] == 70
    assert out["c1"]["min_gap_s"] == 10 and out["c1"]["max_gap_s"] == 60
    # single-turn conversation: zero span, no gaps
    assert out["c2"]["duration_s"] == 0
    assert out["c2"]["min_gap_s"] is None and out["c2"]["max_gap_s"] is None


def test_turn_context_edges_and_window(spark):
    from news_information_retrieval_system_spark.ops.transcripts import (
        turn_context,
    )

    turns = spark.createDataFrame(
        [
            (10, "c1", 0, "user", "first"),
            (11, "c1", 1, "assistant", "second"),
            (12, "c1", 2, "user", "third"),
            (20, "c2", 0, "user", "alone"),
        ],
        "doc_id int, conv_id string, turn_idx int, role string, text string",
    )
    hits = spark.createDataFrame(
        [("q1", 1, 11, 2.0), ("q1", 2, 10, 1.0), ("q2", 1, 20, 3.0)],
        "query_id string, rank int, doc_id int, score double",
    )
    out = {
        (r.query_id, r.doc_id): r.asDict()
        for r in turn_context(turns, hits, before=1, after=1).collect()
    }
    mid = out[("q1", 11)]
    assert mid["context_before"] == "user: first"
    assert mid["context_after"] == "user: third"
    # conversation start: empty before-context, not NULL
    head = out[("q1", 10)]
    assert head["context_before"] == "" and head["context_after"] == "assistant: second"
    # single-turn conversation: both edges empty
    solo = out[("q2", 20)]
    assert solo["context_before"] == "" and solo["context_after"] == ""
    # wider window renders in turn order
    wide = turn_context(turns, hits, before=2, after=2).collect()
    w12 = {r.doc_id: r for r in wide if r.query_id == "q1"}
    assert w12[10].context_after == "assistant: second\nuser: third"


def test_fingerprints_partitioning_invariant(spark):
    base = {
        r.conv_id: r.conv_hash
        for r in conversation_fingerprints(_turns(spark)).collect()
    }
    shuffled = {
        r.conv_id: r.conv_hash
        for r in conversation_fingerprints(
            _turns(spark).repartition(7)
        ).collect()
    }
    assert base == shuffled


def test_turn_format_validated_and_suffix_kept(spark):
    # suffix after {text} is preserved (was silently dropped before)
    out = {
        r["turn_idx"]: r["prompt"]
        for r in sft_pairs(
            _turns(spark), turn_format="<{role}> {text} </t>"
        ).collect()
        if r["conv_id"] == "c1"
    }
    assert out[1] == "<user> hello there </t>"
    # malformed formats raise up front, not as an opaque IndexError
    for bad in ("{role} only", "{text} before {role}", "{role}{text}{text}"):
        with pytest.raises(ValueError, match="turn_format"):
            sft_pairs(_turns(spark), turn_format=bad)
