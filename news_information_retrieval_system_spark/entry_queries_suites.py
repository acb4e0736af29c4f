"""Suite digest entries: window-compression for the driver's 50-slot
correctness gate (VERDICT r4 "Next round" #2).

The registry outgrew the driver's per-round verification window (146
entries, 50 slots), so a full re-verification cycle took 3 rounds. A
*suite digest* re-verifies a whole operator family in ONE slot: it
stacks every member entry's full result set as ``(entry, row_md5)``
rows — one md5 per member output row over that member's complete,
null-sentineled, string-cast column tuple — and the oracle applies the
IDENTICAL wrapper to each member's own first-principles oracle SQL.
A digest match is therefore exactly as strong as running every member
through the driver individually (same rows, same values, same
engine-independent derivations), at 1/N the window cost.

Members must export only string/bigint columns (every float in the
registry is already an ``*_5dp``/``*_e6`` integer by convention), so
the Spark ``CAST(col AS STRING)`` and DuckDB ``CAST(col AS VARCHAR)``
renderings agree byte-for-byte; ``tests/test_suites.py`` drift-gates
the pinned member column lists against the live DataFrames.

This module is registry-agnostic: ``suite_queries`` / ``suite_oracles``
take the already-merged base registry from ``__spark_entry__`` so the
member implementations stay single-sourced.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NULL_SENTINEL = "∅"  # ∅ — cannot appear in any member's data
_SEP = "\x1f"

# suite → member entry → that member's SORTED column list (pinned; the
# drift-gate test asserts these equal sorted(df.columns) at runtime)
SUITES: dict[str, dict[str, list[str]]] = {
    "suite_digest_lexical": {
        "bm25_topk": ["doc_id", "query_id", "rank", "score_5dp"],
        "tfidf_topk": ["doc_id", "query_id", "rank", "score_5dp"],
        "wand_topk": ["doc_id", "query_id", "rank", "score_5dp"],
        "bool_composite": ["doc_id"],
        "phrase_docs": ["doc_id", "match_count"],
        "near_docs": ["doc_id"],
        "wildcard_docs": ["doc_id"],
        "fuzzy_terms": ["df", "dist", "term"],
        "snippet_kwic": ["doc_id", "snippet"],
        "term_df_top50": ["df", "term"],
        "corpus_stats": [
            "avgdl_5dp", "n_docs", "total_postings", "vocab_size",
        ],
        "facet_counts": ["cnt", "lang", "source"],
        "eval_metrics": [
            "ap_5dp", "bpref_5dp", "err_5dp", "f1_5dp", "ndcg_5dp",
            "p_at_k_5dp", "query_id", "r_at_k_5dp", "r_prec_5dp",
            "rbp_5dp", "rr_5dp", "success_5dp",
        ],
        "mmr_topk": ["doc_id", "mmr_rank", "query_id", "score_5dp"],
        "collapsed_topk": [
            "doc_id", "n_collapsed", "query_id", "rank", "score_5dp",
        ],
        "deleted_bm25": ["doc_id", "query_id", "rank", "score_5dp"],
    },
    "suite_digest_dedup": {
        "content_hashes": ["content_hash", "doc_id"],
        "simhash_exact_pairs": ["doc_a", "doc_b", "hamming_dist"],
        "jaccard_pairs": ["doc_a", "doc_b", "jaccard_5dp"],
        "minhash_pairs": ["doc_a", "doc_b", "jaccard_5dp"],
        "dup_groups": ["component", "doc_id"],
    },
    "suite_digest_conv": {
        "conv_stats": [
            "conv_id", "max_turn_idx", "n_assistant", "n_distinct_tools",
            "n_tool_calls", "n_turns", "n_user", "total_tokens",
        ],
        "sft_pairs": ["conv_id", "prompt", "response", "turn_idx"],
        "conv_dedup": [
            "canonical_conv_id", "conv_hash", "conv_id", "is_dup",
        ],
        "tool_transitions": [
            "n_conversations", "n_transitions", "prev_tool", "tool",
        ],
        "conv_durations": [
            "conv_id", "duration_s", "max_gap_s", "min_gap_s", "n_turns",
        ],
        "conv_maxp_topk": [
            "conv_id", "n_matching_turns", "query_id", "rank", "score_5dp",
        ],
        "conv_sump_topk": [
            "conv_id", "n_matching_turns", "query_id", "rank", "score_5dp",
        ],
        "conv_decay_topk": [
            "conv_id", "n_matching_turns", "query_id", "rank", "score_5dp",
        ],
        "turn_context_topk": [
            "context_after", "context_before", "conv_id", "doc_id",
            "query_id", "rank", "score_5dp", "turn_idx",
        ],
    },
    "suite_digest_recsys": {
        "cf_user_recs": ["doc_id", "rec_rank", "score_5dp", "user_id"],
        "cf_item_recs": ["doc_id", "rec_rank", "score_5dp", "user_id"],
        "hybrid_recs": ["doc_id", "rec_rank", "score_5dp", "user_id"],
        "cascade_recs": ["doc_id", "rec_rank", "score_5dp", "user_id"],
        "switching_recs": [
            "doc_id", "method", "rec_rank", "score_5dp", "user_id",
        ],
        "search_log_stats": ["key", "metric", "n", "n_zero", "value_5dp"],
        "cluster_labels": ["cluster", "cw_5dp", "kw_rank", "n_docs", "term"],
        "related_docs": ["cosine_5dp", "doc_id", "rec_rank", "seed_id"],
    },
    "suite_digest_quality": {
        "text_quality": [
            "avg_token_len_5dp", "doc_id", "n_tokens", "quality_5dp",
            "stopword_ratio_5dp",
        ],
        "lang_id_counts": ["cnt", "pred_lang"],
        "llm_token_counts": ["doc_id", "n_bpe_tokens", "n_ws_tokens"],
        "repetition_stats": [
            "distinct_bigrams", "doc_id", "dup_bigram_n", "n_bigrams",
            "top_bigram", "top_bigram_n",
        ],
        "token_length_histogram": ["bucket", "n_docs", "sum_tokens"],
        "pii_redacted": ["doc_id", "n_emails", "redacted_md5"],
        "colloc_pmi": [
            "dice_5dp", "llr_5dp", "n11", "pmi_5dp", "w1", "w2",
        ],
    },
}


def member_digest(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    """One member's output → (entry, row_md5) rows."""
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
        for c in cols
    ]
    return df.select(
        F.lit(name).alias("entry"),
        F.md5(F.concat_ws(_SEP, *rendered)).alias("row_md5"),
    )


def _suite_query(
    members: dict[str, list[str]], base: dict[str, Callable]
) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out: DataFrame | None = None
        for name in sorted(members):
            part = member_digest(
                base[name](spark, sf_dir), name, members[name]
            )
            out = part if out is None else out.unionByName(part)
        return out

    return q


def _suite_oracle(members: dict[str, list[str]], base: dict[str, str]) -> str:
    parts = []
    for name in sorted(members):
        rendered = ", ".join(
            f"coalesce(CAST({c} AS VARCHAR), '{_NULL_SENTINEL}')"
            for c in members[name]
        )
        parts.append(
            f"SELECT '{name}' AS entry,"
            f" md5(concat_ws(chr(31), {rendered})) AS row_md5"
            f" FROM ({base[name]})"
        )
    return "\nUNION ALL\n".join(parts)


def suite_queries(
    base: dict[str, Callable],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        suite: _suite_query(members, base)
        for suite, members in SUITES.items()
    }


def suite_oracles(base: dict[str, str]) -> dict[str, str]:
    return {
        suite: _suite_oracle(members, base)
        for suite, members in SUITES.items()
    }
