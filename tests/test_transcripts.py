"""Conversation-grain operators (ops/transcripts.py)."""

from __future__ import annotations

from news_information_retrieval_system_spark.ops.transcripts import (
    conversation_dedup,
    conversation_fingerprints,
    conversation_stats,
    sft_pairs,
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
