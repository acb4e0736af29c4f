"""Conversation-level operators over the transcript table.

The engine's input is the BASELINE.json input_hint shape —
``(conv_id, turn_idx, role, text, tool, ts)`` — and every indexing/dedup
op so far treats a TURN as the document. This module adds the
conversation-grain operators a transcript training pipeline needs before
turns ever reach the index: per-conversation rollups (the corpus-audit
face at conversation grain), SFT prompt/response pair extraction (the
training-example assembly step), and whole-conversation dedup (two
conversations are duplicates iff their ordered (role, text) turn
sequences are identical — turn-grain exact dedup cannot see this when
individual turns are common boilerplate).

Spark shape: everything is one shuffle on ``conv_id`` (the ingest
layout's bucketing key — sources.py co-locates turns by conversation, so
under a bucketed table these become shuffle-FREE) plus per-partition
window/aggregate work:

* conversation_stats — single groupBy, all counters conditional sums.
* sft_pairs — one window frame (`rowsBetween(-k, -1)` over turn order);
  collect_list under an ordered rows-frame is deterministic because the
  frame IS the order.
* conversation_fingerprints — sort_array(collect_list(struct(...))) per
  conversation canonicalizes turn order independent of partitioning,
  then one md5 over the serialized sequence; the duplicate-group step
  reuses the first-seen-wins window discipline (min conv_id per hash).

Determinism: all serialization uses explicit unit separators (\\x1f
between fields, \\x1e between turns) so no (role, text) pair can collide
by concatenation; ties everywhere break on the natural key ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FIELD_SEP = "\x1f"
TURN_SEP = "\x1e"


def conversation_stats(turns: DataFrame) -> DataFrame:
    """→ (conv_id, n_turns, n_user, n_assistant, n_tool_calls,
    n_distinct_tools, total_tokens, max_turn_idx): per-conversation
    rollup — one groupBy, conditional sums only. Token counts are
    whitespace tokens (the engine's dl definition, index/build.py)."""
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
    has_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    return turns.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("n_user"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias(
            "n_assistant"
        ),
        F.count(F.when(has_tool, 1)).alias("n_tool_calls"),
        F.count_distinct(F.when(has_tool, F.col("tool"))).alias(
            "n_distinct_tools"
        ),
        F.sum(toks).alias("total_tokens"),
        F.max("turn_idx").alias("max_turn_idx"),
    )


def sft_pairs(
    turns: DataFrame,
    context_turns: int = 3,
    response_role: str = "assistant",
    turn_format: str = "{role}: {text}",
    joiner: str = "\n",
) -> DataFrame:
    """→ (conv_id, turn_idx, prompt, response): one training example per
    ``response_role`` turn, with ``prompt`` = the previous ≤
    ``context_turns`` turns rendered ``turn_format`` and joined by
    ``joiner`` (ordered by turn_idx — the stable turn ordering the north
    rule pins). Response turns with NO preceding context (turn_idx
    first in its conversation) are dropped — there is nothing to
    condition on."""
    rendered = F.concat(
        F.lit(turn_format.split("{role}")[0]),
        F.col("role"),
        F.lit(turn_format.split("{role}")[1].split("{text}")[0]),
        F.col("text"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.asc("turn_idx"))
        .rowsBetween(-context_turns, -1)
    )
    ctx = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("response"),
        F.array_join(F.collect_list(rendered).over(w), joiner).alias(
            "prompt"
        ),
    )
    return ctx.filter(
        (F.col("role") == response_role) & (F.col("prompt") != "")
    ).select("conv_id", "turn_idx", "prompt", "response")


def conversation_fingerprints(turns: DataFrame) -> DataFrame:
    """→ (conv_id, conv_hash): md5 over the conversation's ordered
    (role, text) turn sequence, canonicalized with sort_array so the
    hash is partitioning-invariant."""
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text"))
            ),
            lambda t: F.concat(
                t["role"], F.lit(FIELD_SEP), t["text"]
            ),
        ),
        TURN_SEP,
    )
    return turns.groupBy("conv_id").agg(F.md5(seq).alias("conv_hash"))


def conversation_dedup(turns: DataFrame) -> DataFrame:
    """→ (conv_id, conv_hash, canonical_conv_id, is_dup): whole-
    conversation exact dedup — first-seen-wins (min conv_id per hash,
    the engine-wide discipline); ``is_dup = 0`` rows are the
    conversations a pipeline keeps."""
    fps = conversation_fingerprints(turns)
    w = Window.partitionBy("conv_hash").orderBy(F.asc("conv_id"))
    return fps.select(
        "conv_id",
        "conv_hash",
        F.min("conv_id").over(
            Window.partitionBy("conv_hash")
        ).alias("canonical_conv_id"),
        F.when(F.row_number().over(w) > 1, 1).otherwise(0).alias("is_dup"),
    )
