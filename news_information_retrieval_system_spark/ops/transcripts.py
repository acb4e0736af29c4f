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


def _render_turn(turn_format: str):
    """Column expression rendering a turn row under ``turn_format``.

    The format must contain ``{role}`` followed by ``{text}`` exactly
    once each; literal prefix / infix / suffix text around them is
    preserved (previously any suffix after ``{text}`` was silently
    dropped and a malformed format raised an opaque IndexError)."""
    n_role, n_text = turn_format.count("{role}"), turn_format.count("{text}")
    if n_role != 1 or n_text != 1 or (
        turn_format.index("{role}") > turn_format.index("{text}")
    ):
        raise ValueError(
            "turn_format must contain '{role}' then '{text}' exactly once "
            f"each, got {turn_format!r}"
        )
    prefix, rest = turn_format.split("{role}")
    infix, suffix = rest.split("{text}")
    parts = [F.lit(prefix), F.col("role"), F.lit(infix), F.col("text")]
    if suffix:
        parts.append(F.lit(suffix))
    return F.concat(*parts)


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
    condition on. ``turn_format`` must contain ``{role}`` then
    ``{text}`` exactly once each (validated)."""
    rendered = _render_turn(turn_format)
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


def conversation_rank(
    turn_scores: DataFrame,
    turn_conv: DataFrame,
    k: int = 10,
    method: str = "maxp",
) -> DataFrame:
    """Passage-based conversation retrieval: turn-grain relevance scores
    aggregated to the conversation (MaxP / SumP passage aggregation,
    Liu & Croft 2002; the turn is the passage). ``turn_scores`` is any
    (query_id, doc_id, score) frame — e.g. query/bm25.py score_bm25 —
    and ``turn_conv`` maps doc_id → conv_id.

    → (query_id, rank, conv_id, score, n_matching_turns), top-k
    conversations per query, ties (round9(score) desc, conv_id asc).

    Scale shape: the doc→conv map joins on the scoring frame's existing
    doc_id key (co-partitioned if the corpus is bucketed by doc_id), then
    ONE groupBy on (query_id, conv_id) — at 10^12 turns the aggregation
    is map-side-combining on a key strictly coarser than the turn, so the
    conversation rollup shuffles fewer rows than the turn scoring already
    did. MaxP uses max (order-independent); SumP sums ≤ turns-per-conv
    doubles, rounded to 9dp before ranking so tie order is
    partitioning-invariant."""
    aggs = {"maxp": F.max, "sump": F.sum}
    if method not in aggs:
        raise ValueError(f"conversation_rank: unknown method {method!r}")
    conv = (
        turn_scores.join(turn_conv, "doc_id")
        .groupBy("query_id", "conv_id")
        .agg(
            aggs[method]("score").alias("score"),
            F.count("*").alias("n_matching_turns"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("conv_id")
    )
    return (
        conv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "conv_id", "score", "n_matching_turns")
    )


def conversation_rank_decay(
    turn_scores: DataFrame,
    turn_conv: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Recency-decayed conversation retrieval: MaxP/SumP's sibling for
    agent-memory lookups, where a hit in a conversation's LAST turns
    should outrank the same hit buried early. Each matching turn
    contributes ``score · 2^-(last_turn - turn_idx)`` — exact halving
    per turn of age, so the per-turn weight is a single exact binary
    scaling (no transcendental pow) that any engine reproduces
    bit-identically; only the cross-turn sum is subject to fp order,
    the same exposure SumP already carries. ``turn_conv`` maps
    doc_id → (conv_id, turn_idx); the conversation's last turn is
    derived here (one map-side-combinable max per conv_id).

    → (query_id, rank, conv_id, score, n_matching_turns), top-k per
    query, ties (round9(score) desc, conv_id asc).

    Scale shape: same as conversation_rank — the doc→conv join rides
    the scoring frame's doc_id key, the last-turn agg and the final
    rollup both group on keys coarser than the turn, and under the
    conv-bucketed ingest layout (sources.write_transcripts) the
    conv_id exchanges vanish. The age exponent is clamped at 62 so the
    bigint shift never wraps; turns older than 62 steps contribute
    ~2^-62 ≈ 0, which is the semantics a recency prior wants.
    """
    last = turn_conv.groupBy("conv_id").agg(
        F.max("turn_idx").alias("last_idx")
    )
    weighted = (
        turn_scores.join(turn_conv, "doc_id")
        .join(last, "conv_id")
        .withColumn(
            "age",
            F.least(
                F.col("last_idx") - F.col("turn_idx"), F.lit(62)
            ).cast("int"),
        )
        .withColumn(
            "wscore",
            F.col("score")
            / F.expr("cast(shiftleft(cast(1 as bigint), age) as double)"),
        )
    )
    conv = weighted.groupBy("query_id", "conv_id").agg(
        F.sum("wscore").alias("score"),
        F.count("*").alias("n_matching_turns"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("conv_id")
    )
    return (
        conv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "conv_id", "score", "n_matching_turns")
    )


def turn_context(
    turns: DataFrame,
    hits: DataFrame,
    id_col: str = "doc_id",
    before: int = 1,
    after: int = 1,
    turn_format: str = "{role}: {text}",
    joiner: str = "\n",
) -> DataFrame:
    """Conversation-grain KWIC: attach the surrounding turns to retrieved
    turn hits. ``turns`` carries (``id_col``, conv_id, turn_idx, role,
    text); ``hits`` is any small ranked frame keyed on ``id_col`` (e.g.
    bm25_topk output). → hits columns + (conv_id, turn_idx,
    context_before, context_after), where the contexts are the ≤
    ``before``/``after`` adjacent turns rendered ``turn_format`` and
    joined by ``joiner`` ('' when the hit is at a conversation edge).

    Scale shape: lag/lead context is two rows-frames over ONE window
    spec (single shuffle on conv_id, none under a conv-bucketed table);
    the hit set is k·|queries| rows, broadcast into the context frame so
    the join never shuffles the corpus a second time."""
    rendered = _render_turn(turn_format)
    w = Window.partitionBy("conv_id").orderBy(F.asc("turn_idx"))
    ctx = turns.select(
        id_col,
        "conv_id",
        "turn_idx",
        F.array_join(
            F.collect_list(rendered).over(w.rowsBetween(-before, -1)),
            joiner,
        ).alias("context_before"),
        F.array_join(
            F.collect_list(rendered).over(w.rowsBetween(1, after)),
            joiner,
        ).alias("context_after"),
    )
    return ctx.join(F.broadcast(hits), id_col)


def tool_transitions(turns: DataFrame) -> DataFrame:
    """→ (prev_tool, tool, n_transitions, n_conversations): corpus-wide
    tool-call bigram mining — for each conversation, the sequence of
    TOOL-CALL turns in turn order (non-tool turns skipped), counted as
    (prev_tool → tool) transitions. One window lag partitioned by
    conv_id + one global groupBy over a vocabulary-sized key space."""
    has_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    w = Window.partitionBy("conv_id").orderBy(F.asc("turn_idx"))
    seq = turns.filter(has_tool).select(
        "conv_id",
        "tool",
        F.lag("tool").over(w).alias("prev_tool"),
    )
    return (
        seq.filter(F.col("prev_tool").isNotNull())
        .groupBy("prev_tool", "tool")
        .agg(
            F.count("*").alias("n_transitions"),
            F.count_distinct("conv_id").alias("n_conversations"),
        )
    )


def conversation_durations(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """→ (conv_id, n_turns, duration_s, min_gap_s, max_gap_s): wall-clock
    rollup from the transcript's ``ts`` column — conversation span plus
    the min/max inter-turn gap in turn order (integer seconds, so the
    oracle comparison is exact). One lag window + one groupBy on
    conv_id, the same single-shuffle shape as conversation_stats."""
    es = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy("conv_id").orderBy(F.asc("turn_idx"))
    g = turns.select(
        "conv_id",
        es.alias("es"),
        (es - F.lag(es).over(w)).alias("gap_s"),
    )
    return g.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (F.max("es") - F.min("es")).alias("duration_s"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


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
