"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in
``news_information_retrieval_system_spark.entry_queries``; this module
stays a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from news_information_retrieval_system_spark import entry_queries as EQ  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_batch3 as EQ3  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_ops as EQO  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r2 as EQR2  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r3 as EQR3  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r4 as EQR4  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_ltr as EQLTR  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_topics as EQTOP  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_feedback as EQFB  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_termcluster as EQTC  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the full-text index over sf0.001 documents and
    answer the fixed BM25 query batch (top-10 per query)."""
    return EQ.q_bm25_topk(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 registry entries per round, so ordering
# is the correctness-coverage dial. Front of the list: entries that have
# never produced a CORRECTNESS row (all round-3 additions — the registry
# used to merge oldest-first, starving them), entries whose semantics
# changed this round and need re-verification, and brand-new round-4
# entries. Long-green stalwarts (three rounds of green history) rotate to
# the back. Keep this list in sync when adding queries: new names go in
# the first 50.
_PRIORITY: list[str] = [
    # -- never driver-checked before round 4 (VERDICT r3 "Next round" #1)
    "hybrid_zscore_topk",
    "bool_field_phrase",
    "bm25_stopfilter_topk",
    "doc_keywords",
    "model_compare_terms",
    "trigram_lm_ppx",
    "colloc_stats",
    "compression_compare",
    "rake_top",
    "textrank_top",
    "kmeans_clusters",
    "related_docs",
    "key_sentences",
    "ltr_features",
    # (ltr_train_coefs parked past the window: rows-only by design —
    # a driver row adds nothing beyond pytest, and A12's oracle-backed
    # gate is ltr_features above)
    "lda_topics",
    "hier_clusters",
    "feedback_event_stats",
    "feedback_top_clicked",
    "feedback_user_ctr",
    "event_value_quantiles",
    "windowed_event_counts",
    "session_stats",
    "star_pairs",
    "editdist_pairs",
    # (term_clusters_editdist parked past the window: same absorption
    # code path as in-window term_clusters_cooc, pair input gated by
    # in-window editdist_pairs)
    "cooc_pairs",
    "term_clusters_cooc",
    # -- semantics changed in round 4: re-verify
    "rocchio_terms",        # γ negative-feedback term added
    # -- new round-4 entries
    "simhash_exact_pairs",  # full banded pair set vs exact Hamming oracle
    "model_unique_docs",    # Q27 unique-docs payload
    "model_rank_changes",   # Q27 rank-span payload
    "contract_violations",
    # (normalized_records parked past the window: same data-contract
    # module as in-window contract_violations, which counts rejects per
    # rule; the normalize output is additionally pytest-pinned)
    "model_overlap",
    "query_suggestions",
    "json_docs",
    "ef_stats",             # Elias-Fano codec: encoder bytes vs closed form
    # (json_array_docs parked past the window: native multiLine
    # spark.read.json variant of the in-window json_docs path)
    "ivf_cosine_topk",      # IVF ANN: quantizer+probe+rerank hash-gated
    "hybrid_dense_sparse_topk",  # Q21×A11 RRF over BM25 + dense cosine
    "pfor_stats",           # PForDelta codec: encoder bytes vs closed-form
    "pii_redacted",         # email scrub: count + redacted-text hash
    "token_length_histogram",  # power-of-two sequence-length buckets
    "llm_token_counts",     # BPE-ish regex token counter (portable)
    "repetition_stats",     # Gopher-style duplicate/top-bigram signals
    "split_leakage",        # cross-split exact-copy leak detector
    "curation_accounting",  # composed curate_corpus: per-stage counts
    "duplicate_spans",      # cross-doc repeated-span marking (exact-
                            # substring-dedup marking pass, interval-
                            # union coverage oracle)
    "packed_examples",      # inverse packing map — oracle re-derives the
                            # FULL placement + slice math (supersedes the
                            # packed_sequences check, same code path)
    "stratified_sample",    # deterministic mixture downsampling
    "ppx_quality",          # CCNet-style bigram-LM perplexity flags
    "eval_sig_test",        # paired t-test + Wilcoxon between two rankers
    "corpus_audit",         # per-field completeness/length audit payload
    # (packed_sequences + packing_stats sit just past the window — both
    # are implied by packed_examples' stronger oracle)
    # rotated out of the window, each superseded by a strictly stronger
    # in-window gate on the same code path: simhash_pairs (by
    # simhash_exact_pairs), jaccard_pairs + contamination_overlap (both
    # re-derived stage-by-stage inside curation_accounting's oracle),
    # dataset_splits (split_col recomputed byte-for-byte by
    # split_leakage's oracle)
    # ---------------------------------------------------------------------
    # everything below is past the driver's 50-entry window this round:
    "normalized_records",   # data-contract normalize output (module
                            # gated in-window by contract_violations)
    "shuffle_order",        # deterministic training-order shuffle
                            # (salted-md5 shard + within-shard rank)
    "packed_sequences",     # placement map (implied by packed_examples)
    "packing_stats",        # aggregate over the placement map
    "pr_curve",             # 11-point interpolated PR (oracle-backed)
    "mi_patterns",          # PAT-tree pattern mining via n-gram MI
    "phrase_blocked_docs",  # compressed-positional phrase kernel
    "near_blocked_docs",    # compressed-positional NEAR/n kernel
    "window_blocked_docs",  # compressed-positional window kernel
    "ltr_train_coefs",      # rows-only (pyspark.ml LR, by design)
    "term_clusters_editdist",  # same absorption path as _cooc (in-window)
    # SemDeDup embedding-cluster near-dup pruning (round-4 session-3
    # addition, local replica green; full-pipeline DuckDB re-derivation
    # incl. every Lloyd iteration) — rotate in next round:
    "semantic_dedup",
    # BM25F weighted multi-field ranking (round-4 session-3 addition,
    # local replica green; full per-field SQL re-derivation) — rotate in:
    "bm25f_topk",
    # fastText-style trained quality filter (round-4 session-3 addition):
    # features + scoring oracles are first-principles SQL; coefs is an
    # ltr-style drift-gate (pinned across two fresh JVMs) — rotate in:
    "quality_model_features",
    "quality_model_scores",
    "quality_model_coefs",
    # temperature-based source mixing (Pile/DoReMi resampling rule,
    # round-4 session-3 addition; first-principles SQL oracle):
    "temperature_mix",
    # champion lists: impact-ordered static-prune tier (round-4 session-3
    # addition; full SQL re-derivation of tier + scoring):
    "champion_topk",
    # sequential dependence model: LM + ordered/unordered positional
    # pair features (round-4 session-3 addition; full SQL re-derivation):
    "sdm_topk",
    # T8 NER closed after the window filled (local replica green; offset
    # goldens in tests/test_ner.py) — rotate in next round:
    "ner_entities",
    "ner_type_stats",
    "ner_top_entities",
    # exact-substring-dedup REMOVAL pass (islands merge + reconstruction
    # md5-checked; marking sibling duplicate_spans is in-window):
    "span_removed_docs",
    # BPE tokenizer induction (24-round training loop re-derived round
    # by round in the oracle) + token budgets under the trained vocab:
    "bpe_merges",
    "bpe_token_counts",
    # T3/T4 testable fallback: FMM segmentation, hand-derived goldens:
    "fmm_segments",
    # round-4 session-4 additions (local replica green; window already
    # full) — rotate in next round:
    "tiered_topk",          # tiered impact-ordered index, per-query
                            # adaptive fallback (full SQL re-derivation)
    "rerank2_topk",         # two-phase retrieve-then-rerank, pinned
                            # linear model over the LTR feature row
    "incr_dedup_flags",     # incremental batch-vs-corpus exact dedup
    "incr_simhash_hits",    # incremental fuzzy dedup vs stored SimHash
                            # state (exact cross-Hamming oracle)
    # conversation-grain ops over the derived transcript shape (round-4
    # session-5; window already full) — rotate in next round:
    "conv_stats",           # per-conversation rollup
    "sft_pairs",            # prompt/response training-pair extraction
    "conv_dedup",           # whole-conversation exact dedup
    "conv_maxp_topk",       # MaxP passage→conversation retrieval
    "conv_sump_topk",       # SumP variant
    "conv_decay_topk",      # recency-decayed (2^-age turn weights)
    "tool_transitions",     # tool-call bigram mining
    "conv_durations",       # ts-based conversation span/gap rollup
    "turn_context_topk",    # top-k turns with neighboring-turn context
    # green in r02 (lm_kl/combmnz) or green r01-r03 (the stalwarts) —
    # first to rotate back in once the round-4 additions have their rows
    "bm25_topk",
    "lm_kl_topk",
    "hybrid_combmnz_topk",
    "wand_topk",
    "tok_counts",
    "corpus_stats",
    "postings_probe",
    "tfidf_topk",
    "lm_topk",
    "phrase_docs",
    "minhash_pairs",
    "dup_groups",
    "cosine_topk",
    "eval_metrics",
]


def _ordered(merged: dict) -> dict:
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from news_information_retrieval_system_spark import entry_queries_r5 as EQR5
    from news_information_retrieval_system_spark import entry_queries_r6 as EQR6
    from news_information_retrieval_system_spark import entry_queries_r7 as EQR7
    from news_information_retrieval_system_spark import entry_queries_r8 as EQR8
    from news_information_retrieval_system_spark import entry_queries_bpe as EQBPE
    from news_information_retrieval_system_spark import entry_queries_curation as EQCUR
    from news_information_retrieval_system_spark import entry_queries_r9 as EQR9
    from news_information_retrieval_system_spark import entry_queries_r10 as EQR10

    return _ordered({
        **EQR6.registry(),
        **EQR7.registry(),
        **EQR8.registry(),
        **EQBPE.registry(),
        **EQCUR.registry(),
        **EQ.registry(),
        **EQO.registry(),
        **EQ3.registry(),
        **EQR2.registry(),
        **EQR3.registry(),
        **EQR4.registry(),
        **EQLTR.registry(),
        **EQTOP.registry(),
        **EQFB.registry(),
        **EQTC.registry(),
        **EQR5.registry(),
        **EQR9.registry(),
        **EQR10.registry(),
    })


def oracle_sql() -> dict[str, str]:
    from news_information_retrieval_system_spark import entry_queries_r5 as EQR5
    from news_information_retrieval_system_spark import entry_queries_r6 as EQR6
    from news_information_retrieval_system_spark import entry_queries_r7 as EQR7
    from news_information_retrieval_system_spark import entry_queries_r8 as EQR8
    from news_information_retrieval_system_spark import entry_queries_bpe as EQBPE
    from news_information_retrieval_system_spark import entry_queries_curation as EQCUR
    from news_information_retrieval_system_spark import entry_queries_r9 as EQR9
    from news_information_retrieval_system_spark import entry_queries_r10 as EQR10

    return _ordered({
        **EQR6.ORACLES,
        **EQR7.ORACLES,
        **EQR8.ORACLES,
        **EQBPE.ORACLES,
        **EQCUR.ORACLES,
        **EQ.ORACLES,
        **EQO.ORACLES,
        **EQ3.ORACLES,
        **EQR2.ORACLES,
        **EQR3.ORACLES,
        **EQR4.ORACLES,
        **EQLTR.ORACLES,
        **EQTOP.ORACLES,
        **EQFB.ORACLES,
        **EQTC.ORACLES,
        **EQR5.ORACLES,
        **EQR9.ORACLES,
        **EQR10.ORACLES,
    })
