"""Physical-plan audit: capture `.explain("formatted")` for the headline
plans and ASSERT the scale-critical properties instead of eyeballing them.

Checks, per plan (each one is a property that decides whether the plan
survives a 100x scale-up):

* scan pruning   — the parquet scan's ReadSchema carries only the columns
                   the query projects (no full-width scan for a 2-column
                   projection).
* filter pushdown— metadata predicates reach the scan (PushedFilters
                   non-empty) instead of running post-scan.
* broadcast      — the small side of every dim join (query terms,
                   benchmark shingles, centroids) is a BroadcastExchange,
                   never a shuffled sort-merge join.
* no cartesian   — no CartesianProduct / BroadcastNestedLoopJoin sneaks
                   into a hot path (only the documented pairwise ops may
                   cross-join).
* narrow build   — the flat-postings build plan contains NO shuffle
                   Exchange up to the postings rows (row-local histogram;
                   the only exchanges allowed are the ones feeding the
                   final stats aggregates).
* codegen        — the scoring expression tree stays inside
                   WholeStageCodegen spans (no per-row Python).

Writes PLANS.md (the annotated explain dumps + verdict table) and exits
non-zero if any assertion fails — run it per round like the oracle
harness. Uses sf0.001 (plans don't change with data volume; AQE is on in
the real session, so what matters is the static shape + exchange count).

Usage: python3 scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from news_information_retrieval_system_spark.index.build import (  # noqa: E402
    build_index,
    flat_postings,
    tokens_df,
)
from news_information_retrieval_system_spark.ops.curation import (  # noqa: E402
    benchmark_contamination,
)
from news_information_retrieval_system_spark.query.bm25 import (  # noqa: E402
    bm25_topk,
    query_terms_df,
)
from news_information_retrieval_system_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit", cores=4, shuffle_partitions=4)
    docs_path = f"{sf_dir}/documents.parquet"
    events_path = f"{sf_dir}/events.parquet"

    results: list[tuple[str, str, bool, str]] = []  # (plan, check, ok, note)
    dumps: list[tuple[str, str]] = []

    def check(plan: str, name: str, ok: bool, note: str) -> None:
        results.append((plan, name, ok, note))

    # ---------------------------------------------------------- build plan
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    fp = flat_postings(tokens_df(docs))
    p = explain_str(fp)
    dumps.append(("flat_postings (index build)", p))
    check(
        "flat_postings",
        "narrow (no shuffle Exchange)",
        "Exchange" not in p,
        "row-local tf histogram — tokenize+count without repartitioning",
    )
    check(
        "flat_postings",
        "scan prunes to (doc_id, text)",
        "ReadSchema: struct<doc_id:bigint,text:string>" in p,
        "no full-width scan",
    )

    # ----------------------------------------------------------- bm25 plan
    idx = build_index(docs).materialize()
    q = query_terms_df(spark, {"q1": "fast table scan", "q2": "key value"})
    top = bm25_topk(idx, q, k=10)
    p = explain_str(top)
    dumps.append(("bm25_topk (naive declarative plan)", p))
    check(
        "bm25_topk",
        "query-term join broadcast",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "tiny query set must broadcast against postings",
    )
    check(
        "bm25_topk",
        "no cartesian product",
        "CartesianProduct" not in p,
        "",
    )
    check(
        "bm25_topk",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "partial top-k per partition BEFORE the exchange — the batch "
        "analogue of TakeOrderedAndProject's heap+merge",
    )
    check(
        "bm25_topk",
        "scoring inside whole-stage codegen",
        "codegen id" in p,
        "no per-row Python in the scoring expression tree",
    )

    # ------------------------------------------- metadata filter pushdown
    ev = (
        spark.read.parquet(events_path)
        .filter(F.col("event_type") == "click")
        .select("event_type", "user_id")
    )
    p = explain_str(ev)
    dumps.append(("events filter (metadata predicate)", p))
    check(
        "events_filter",
        "predicate pushed to scan",
        "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in p,
        "",
    )
    check(
        "events_filter",
        "scan prunes to 2 columns",
        # ReadSchema lists parquet file order — accept either ordering
        ("ReadSchema: struct<user_id:bigint,event_type:string>" in p)
        or ("ReadSchema: struct<event_type:string,user_id:bigint>" in p),
        "",
    )

    # ------------------------------------------------- contamination plan
    d = spark.read.parquet(docs_path).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    cands = d.filter(F.col("doc_id") % 97 != 0)
    ov = benchmark_contamination(cands, bench, k=3)
    p = explain_str(ov)
    dumps.append(("benchmark_contamination", p))
    check(
        "contamination",
        "benchmark dictionary broadcast",
        "BroadcastExchange" in p,
        "corpus side never shuffles for the join",
    )
    check(
        "contamination",
        "partial aggregation before exchange",
        "partial_count" in p or "HashAggregate" in p,
        "map-side combine on the overlap count",
    )

    # ------------------------------------------------------------ wand plan
    from news_information_retrieval_system_spark.index.segments import (
        build_blocked_postings,
    )
    from news_information_retrieval_system_spark.query.wand import wand_topk

    blk = build_blocked_postings(idx.postings, term_dict=idx.term_stats)
    qi = q.join(idx.term_stats.select("term", "idf"), "term")
    n_docs, avgdl = idx.scalar_stats()
    wt = wand_topk(blk, qi, n_docs, avgdl, k=10)
    p = explain_str(wt)
    dumps.append(("wand_topk (block-max DAAT kernel)", p))
    check(
        "wand_topk",
        "kernel is Arrow-batched (MapInPandas)",
        "MapInPandas" in p,
        "block decode + DAAT scoring in vectorized batches, no per-row Python",
    )
    check(
        "wand_topk",
        "partial top-k around the merge exchange (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "per-partition heap before the k-way merge — partition-count-"
        "independent merge volume",
    )
    check(
        "wand_topk",
        "query-side dims broadcast",
        "BroadcastHashJoin" in p,
        "",
    )
    check(
        "wand_topk",
        "no cartesian product",
        "CartesianProduct" not in p,
        "",
    )

    # -------------------------------------------------- sequence packing
    from news_information_retrieval_system_spark.ops.curation import (
        pack_sequences,
    )

    placed = pack_sequences(
        spark.read.parquet(docs_path), seq_len=512, num_ranges=4
    )
    p = explain_str(placed)
    dumps.append(("pack_sequences (placement pass after range exchange)", p))
    check(
        "pack_sequences",
        "cumsum pass is shuffle-free (no Exchange after checkpoint)",
        "Exchange" not in p,
        "global offsets come from a P-row driver aggregate, not a second "
        "full-table exchange (the window-over-partition-id alternative)",
    )
    check(
        "pack_sequences",
        "cumsum pass is Arrow-batched (MapInPandas)",
        "MapInPandas" in p,
        "vectorized numpy cumsum per batch, scalar carry across batches",
    )

    # -------------------------------------------------- positional blocks
    import tempfile

    from news_information_retrieval_system_spark.index.positional_blocks import (
        build_positional_blocks,
        phrase_match_blocks,
    )

    pb = build_positional_blocks(docs)
    p = explain_str(pb)
    dumps.append(("build_positional_blocks", p))
    import re

    check(
        "positional_build",
        "exactly one shuffle Exchange",
        len(re.findall(r"\(\d+\) Exchange\b", p)) == 1
        and "hashpartitioning(term" in p,
        "the token stream shuffles once, keyed (term, block_key) — the "
        "doc-range key bounds every hot-term group",
    )
    check(
        "positional_build",
        "scan prunes to (doc_id, text)",
        "ReadSchema: struct<doc_id:bigint,text:string>" in p,
        "",
    )
    check(
        "positional_build",
        "encoder is Arrow-batched (FlatMapGroupsInPandas)",
        "FlatMapGroupsInPandas" in p,
        "per-(term, block) varint encode in vectorized numpy",
    )

    # blocked phrase over a PERSISTED block table: the term IN (...)
    # filter must reach the parquet scan — at 100 TB only the phrase's
    # terms' blocks are ever read
    with tempfile.TemporaryDirectory() as td:
        pb.write.parquet(f"{td}/blocks")
        stored = spark.read.parquet(f"{td}/blocks")
        pm = phrase_match_blocks(stored, ["fast", "scan"])
        p = explain_str(pm)
        dumps.append(("phrase_match_blocks (over stored block table)", p))
        check(
            "phrase_blocked",
            "term filter pushed to block scan",
            "PushedFilters: [In(term" in p,
            "only the phrase terms' blocks are read",
        )
        check(
            "phrase_blocked",
            "no join in the query plan",
            "Join" not in p,
            "all phrase terms of a doc share one block_key — one "
            "groupBy(block_key) kernel replaces k-1 doc_id equi-joins",
        )
        check(
            "phrase_blocked",
            "kernel is Arrow-batched (FlatMapGroupsInPandas)",
            "FlatMapGroupsInPandas" in p,
            "vectorized np.isin offset chain, no per-row Python",
        )

    # ------------------------------------------------------- mi_patterns
    from news_information_retrieval_system_spark.ops.patterns import mi_patterns

    mp = mi_patterns(docs, n_min=2, n_max=3, min_freq=5)
    p = explain_str(mp)
    dumps.append(("mi_patterns (n-gram MI extraction)", p))
    check(
        "mi_patterns",
        "partial aggregation before exchange",
        "partial_count" in p or "HashAggregate" in p,
        "map-side combine on the n-gram counts",
    )
    check(
        "mi_patterns",
        "token-total is a broadcast (1 row), not a shuffle",
        "BroadcastExchange" in p and "CartesianProduct" not in p,
        "",
    )
    check(
        "mi_patterns",
        "scan prunes to text only",
        "ReadSchema: struct<text:string>" in p,
        "doc_id isn't needed for corpus-wide counts — Catalyst drops it",
    )

    # -------------------------------------------------- duplicate spans
    from news_information_retrieval_system_spark.ops.curation import (
        duplicate_spans,
    )

    ds = duplicate_spans(docs, k=5)
    p = explain_str(ds)
    dumps.append(("duplicate_spans (exact-substring span marking)", p))
    check(
        "duplicate_spans",
        "gram slide + coverage all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "the k-gram slide is a transform/slice expression, not a UDF",
    )
    check(
        "duplicate_spans",
        "occurrence re-join is an equi hash join, not cartesian",
        "CartesianProduct" not in p
        and (
            "BroadcastHashJoin" in p
            or "SortMergeJoin" in p
            or "ShuffledHashJoin" in p
        ),
        "1:1 dictionary enrich on gram — no shingle self-join pair "
        "blowup; at test SF the dictionary is small enough that AQE "
        "broadcasts it, at 100 TB the same plan degrades gracefully to "
        "a gram-keyed shuffle join",
    )
    check(
        "duplicate_spans",
        "partial aggregation before the gram exchange",
        "partial_count" in p or "HashAggregate" in p,
        "hot grams reach the final agg one row per upstream partition",
    )
    check(
        "duplicate_spans",
        "scan prunes to (doc_id, text)",
        "ReadSchema: struct<doc_id:bigint,text:string>" in p,
        "",
    )

    # -------------------------------------------- remove_duplicate_spans
    from news_information_retrieval_system_spark.ops.curation import (
        remove_duplicate_spans,
    )

    rs = remove_duplicate_spans(docs, k=5)
    p = explain_str(rs)
    dumps.append(("remove_duplicate_spans (exact-substring span removal)", p))
    check(
        "remove_duplicate_spans",
        "islands merge + token drop all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "gaps-and-islands is lag+sum windows; the covered-token drop is "
        "a nested higher-order filter/exists over the token array",
    )
    check(
        "remove_duplicate_spans",
        "coverage applied per-doc via array join, never a per-token range join",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
        "islands are collected to a per-doc array (bounded by n_tokens/k) "
        "and joined 1:1 on doc_id — token×interval pairs never shuffle",
    )
    check(
        "remove_duplicate_spans",
        "scan prunes to (doc_id, text)",
        "ReadSchema: struct<doc_id:bigint,text:string>" in p,
        "",
    )

    # ------------------------------------------------------- BPE round
    from news_information_retrieval_system_spark.ops.bpe import (
        _pair_counts,
        apply_merge_col,
        word_freq_table,
    )

    wtab = word_freq_table(docs)
    bp = explain_str(_pair_counts(wtab))
    dumps.append(("bpe pair-count round (training unit)", bp))
    check(
        "bpe_round",
        "pair explode + count all JVM (no Python eval)",
        "BatchEvalPython" not in bp and "ArrowEvalPython" not in bp,
        "symbol extraction is regexp_extract_all, pairs a transform/"
        "explode expression",
    )
    check(
        "bpe_round",
        "partial aggregation before the pair exchange",
        "HashAggregate" in bp,
        "hot pairs reach the final agg one row per upstream partition",
    )
    check(
        "bpe_round",
        "no cartesian anywhere in the round",
        "CartesianProduct" not in bp,
        "",
    )
    bm = explain_str(wtab.withColumn("enc", apply_merge_col("enc", "a", "b")))
    check(
        "bpe_round",
        "merge application adds no exchange and no Python eval",
        bm.count("Exchange") == explain_str(wtab).count("Exchange")
        and "BatchEvalPython" not in bm,
        "one JVM replace per row on top of the vocab table's own plan",
    )

    # ------------------------------------------------ csoundex find_similar
    from news_information_retrieval_system_spark.ops.csoundex import (
        csoundex_code_col,
        find_similar,
    )

    # corpus terms → codes (the phonetic-expansion input), tiny query side
    cands = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
        .select(
            F.col("term").alias("doc_id"),
            csoundex_code_col(F.col("term")).alias("csoundex"),
        )
    )
    qdf = spark.createDataFrame(
        [("q1", "F14"), ("q2", "S99")], "query_id string, csoundex string"
    )
    fs = find_similar(qdf, cands, threshold=0.6, topk=8)
    p = explain_str(fs)
    dumps.append(("csoundex find_similar (phonetic candidate scan)", p))
    check(
        "csoundex_similar",
        "query side broadcast (candidates never shuffle to pair)",
        "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p,
        "the documented brute-force scan: tiny query set × full term "
        "dictionary — broadcast is the only acceptable pairing plan",
    )
    check(
        "csoundex_similar",
        "encoder + similarity all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "pinyin parse, bucket lookup, and zip_with similarity are pure "
        "Column expressions",
    )
    check(
        "csoundex_similar",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "partial top-k per partition before the rank exchange",
    )

    # --------------------------------------------------- champion lists
    from news_information_retrieval_system_spark.query.champion import (
        build_champion_lists,
        champion_topk,
    )

    ch = build_champion_lists(idx, m=16)
    p = explain_str(ch)
    dumps.append(("champion list build (per-term impact tier)", p))
    check(
        "champion_build",
        "per-term top-m rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "partial top-m per partition before the term exchange — tier "
        "build volume is m·|vocab| after the pushdown, not |postings|",
    )
    check(
        "champion_build",
        "corpus stats broadcast (1 row), no cartesian blowup",
        "BroadcastExchange" in p and "CartesianProduct" not in p,
        "avgdl rides a 1-row broadcast into the impact projection",
    )
    check(
        "champion_build",
        "impact projection all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )
    ct = champion_topk(ch, q, k=10)
    p = explain_str(ct)
    dumps.append(("champion_topk (tier-only scoring)", p))
    check(
        "champion_topk",
        "query side broadcast",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "tier join never shuffles the champion frame on the query side",
    )
    check(
        "champion_topk",
        "partial aggregation before the (query, doc) exchange",
        "HashAggregate" in p,
        "map-side combine on the stored-impact sums",
    )
    check(
        "champion_topk",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "",
    )

    # ------------------------------------------------------------- SDM
    from news_information_retrieval_system_spark.index.build import (
        build_positional,
    )
    from news_information_retrieval_system_spark.query.sdm import (
        query_pairs_df,
        sdm_topk,
    )

    pos = build_positional(docs)
    qp = query_pairs_df(spark, {"q1": "fast table scan", "q2": "key value"})
    sd = sdm_topk(idx, pos, q, qp, k=10)
    p = explain_str(sd)
    dumps.append(("sdm_topk (LM + ordered/unordered pair features)", p))
    check(
        "sdm_topk",
        "positional pair self-join is an equi join (no CartesianProduct)",
        "CartesianProduct" not in p,
        "pair counts come from one (pb, doc_id)-keyed join of posting-"
        "list-sized frames, never a position explode or cross pairing",
    )
    check(
        "sdm_topk",
        "query pair dims broadcast",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "the distinct-pair table and per-query pair weights are tiny",
    )
    check(
        "sdm_topk",
        "window/ordered counts all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "aggregate/filter higher-order functions over the two position "
        "arrays — no per-row Python, no position explode",
    )

    # ----------------------------------------------------------- BM25F
    from news_information_retrieval_system_spark.query.bm25f import (
        bm25f_topk,
    )

    fdocs = spark.read.parquet(docs_path).select(
        "doc_id", F.col("text").alias("title"), F.col("text").alias("body")
    )
    bf = bm25f_topk(fdocs, q, k=10, field_weights={"title": 2.5, "body": 1.0})
    p = explain_str(bf)
    dumps.append(("bm25f_topk (weighted multi-field ranking)", p))
    check(
        "bm25f_topk",
        "query + per-field avgdl dims broadcast",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "|F|-row avgdl and the query set never shuffle the tf frame",
    )
    check(
        "bm25f_topk",
        "field weighting all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "per-field weights/b ride literal maps inside codegen",
    )
    check(
        "bm25f_topk",
        "partial aggregation before every exchange",
        "HashAggregate" in p and "CartesianProduct" not in p,
        "wtf and score sums combine map-side",
    )
    check(
        "bm25f_topk",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "",
    )

    # --------------------------------------------------- semantic_dedup
    from news_information_retrieval_system_spark.ops.semdedup import (
        semantic_dedup,
    )

    vecs = spark.range(512).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda pp: (F.xxhash64(F.col("id"), pp) % 1000) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    sdd = semantic_dedup(vecs, k=8, n_iters=2, tau=0.95)
    p = explain_str(sdd)
    dumps.append(("semantic_dedup (cluster-bounded pair scan)", p))
    check(
        "semantic_dedup",
        "pair scan keyed on cluster (equi join, no CartesianProduct)",
        "CartesianProduct" not in p,
        "the all-pairs cosine scan is bounded to within-cluster pairs — "
        "the Σ|c|² contract that makes SemDeDup feasible at corpus scale",
    )
    check(
        "semantic_dedup",
        "cosine + survivor flags all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "zip_with/aggregate dot products, no per-row Python",
    )

    # ---------------------------------------------- trained quality filter
    from news_information_retrieval_system_spark.ops.quality_model import (
        hashed_token_features,
        quality_score,
    )

    feats = hashed_token_features(docs, n_buckets=64)
    qs = quality_score(feats, {3: 0.5, 17: -0.25}, intercept=0.1)
    p = explain_str(qs)
    dumps.append(("quality_score (pinned-weight corpus pass)", p))
    check(
        "quality_score",
        "weight table broadcast",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "|buckets| rows join the feature frame map-side",
    )
    check(
        "quality_score",
        "hashing + logit all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "the hashing trick is md5-digit Column algebra",
    )
    check(
        "quality_score",
        "partial aggregation before the doc exchange",
        "HashAggregate" in p,
        "per-doc logit sums combine map-side",
    )

    # ------------------------------------------------- temperature_mix
    from news_information_retrieval_system_spark.ops.curation import (
        temperature_mix,
    )

    tdocs = spark.read.parquet(docs_path)
    tm, _rates = temperature_mix(
        tdocs, alpha=0.5, key_col="lang", mark_only=True
    )
    p = explain_str(tm)
    dumps.append(("temperature_mix (tempered-rate keep pass)", p))
    check(
        "temperature_mix",
        "decision pass is narrow (no shuffle Exchange)",
        "Exchange" not in p,
        "rates come from a |sources|-row driver aggregate; the keep "
        "decision itself is a salted-md5 Column filter — one scan, no "
        "shuffle, no skew (hashes the id, not the key)",
    )
    check(
        "temperature_mix",
        "keep decision all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )

    # -------------------------------------------- conversation-grain ops
    from news_information_retrieval_system_spark.entry_queries_r10 import _tr
    from news_information_retrieval_system_spark.ops.transcripts import (
        conversation_rank,
        conversation_stats,
        tool_transitions,
        turn_context,
    )
    from news_information_retrieval_system_spark.query.bm25 import score_bm25

    turns = _tr(spark, sf_dir)
    p = explain_str(conversation_stats(turns))
    dumps.append(("conversation_stats (per-conv rollup)", p))
    check(
        "conversation_stats",
        "partial aggregation before exchange",
        "partial_count" in p or "partial_sum" in p,
        "map-side combine on conv_id — the exchange carries one row per "
        "conversation per map partition, not one per turn",
    )
    check(
        "conversation_stats",
        "rollup all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )

    conv_map = spark.read.parquet(docs_path).select(
        "doc_id",
        F.concat(F.lit("c"), F.floor(F.col("doc_id") / 4).cast("string")).alias(
            "conv_id"
        ),
    )
    scores = score_bm25(idx, q)
    p = explain_str(conversation_rank(scores, conv_map, k=10, method="maxp"))
    dumps.append(("conversation_rank (MaxP passage→conversation)", p))
    check(
        "conversation_rank",
        "partial max before the conv exchange",
        "partial_max" in p,
        "the conversation rollup combines map-side on a key coarser than "
        "the turn — the exchange moves fewer rows than scoring did",
    )
    check(
        "conversation_rank",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "partial top-k per partition before the final per-query sort",
    )
    check(
        "conversation_rank",
        "no cartesian product",
        "CartesianProduct" not in p,
        "",
    )

    from news_information_retrieval_system_spark.ops.transcripts import (
        conversation_rank_decay,
    )

    tmap = spark.read.parquet(docs_path).select(
        "doc_id",
        F.concat(F.lit("c"), F.floor(F.col("doc_id") / 4).cast("string")).alias(
            "conv_id"
        ),
        (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
    )
    p = explain_str(conversation_rank_decay(scores, tmap, k=10))
    dumps.append(("conversation_rank_decay (recency-weighted rollup)", p))
    check(
        "conversation_rank_decay",
        "partial sum before the conv exchange",
        "partial_sum" in p,
        "the decayed rollup still combines map-side — the per-turn 2^-age "
        "weight is applied before aggregation, so the exchange carries one "
        "row per (query, conv) per map partition",
    )
    check(
        "conversation_rank_decay",
        "decay weights all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "shiftleft + divide are codegen expressions",
    )
    check(
        "conversation_rank_decay",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "",
    )
    check(
        "conversation_rank_decay",
        "no cartesian product",
        "CartesianProduct" not in p,
        "",
    )

    hits = bm25_topk(idx, q, k=10)
    raw_turns = spark.read.parquet(docs_path).select(
        "doc_id",
        F.concat(F.lit("c"), F.floor(F.col("doc_id") / 4).cast("string")).alias(
            "conv_id"
        ),
        (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        "text",
    )
    p = explain_str(turn_context(raw_turns, hits))
    dumps.append(("turn_context (conversation-grain KWIC)", p))
    check(
        "turn_context",
        "hit set broadcast into the context frame",
        "BroadcastHashJoin" in p or "BroadcastExchange" in p,
        "k·|queries| hits never force a corpus shuffle for the join",
    )
    check(
        "turn_context",
        "context window all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )

    p = explain_str(tool_transitions(turns))
    dumps.append(("tool_transitions (tool-call bigrams)", p))
    check(
        "tool_transitions",
        "partial aggregation before the bigram exchange",
        "partial_count" in p,
        "the final groupBy key space is vocabulary-sized; map-side "
        "combine keeps the exchange tiny",
    )

    # ------------------------------------------- round-5: collaborative CF
    from news_information_retrieval_system_spark.ops.recommend_cf import (
        interactions,
        user_based_recs,
        user_similarities,
    )

    events_full = spark.read.parquet(events_path)
    inter = interactions(events_full)
    p = explain_str(inter)
    dumps.append(("cf interactions (event log → rating matrix)", p))
    check(
        "cf_interactions",
        "partial aggregation before the (user, doc) exchange",
        "partial_sum" in p,
        "the rating distillation combines map-side — the exchange carries "
        "one row per (user, doc) per map partition, not one per raw event",
    )
    check(
        "cf_interactions",
        "scan pruned to the interaction columns",
        "event_id" not in p.split("ReadSchema")[-1].split("\n")[0]
        if "ReadSchema" in p
        else False,
        "props/user_id/event_type/value only — the event payload never "
        "leaves the scan for non-interaction analysis",
    )
    p = explain_str(user_similarities(inter))
    dumps.append(("cf user_similarities (sparse co-interaction cosine)", p))
    check(
        "cf_user_similarities",
        "no cartesian product",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
        "the user×user cosine is an equi-join on doc_key (co-interacting "
        "pairs only), never an all-pairs enumeration",
    )
    check(
        "cf_user_similarities",
        "pair dot products combine map-side",
        "partial_sum" in p,
        "",
    )
    check(
        "cf_user_similarities",
        "cosine all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "integer dot/norm + one IEEE divide, all codegen",
    )
    p = explain_str(user_based_recs(inter, n_neighbors=5, k=3))
    dumps.append(("cf user_based_recs (neighbor vote + top-k)", p))
    check(
        "cf_user_based_recs",
        "neighbor/rec top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "both row_number windows (top-n neighbors, top-k recs) keep "
        "per-partition heaps before the final sort",
    )
    check(
        "cf_user_based_recs",
        "consumed items excluded by a hash anti-join",
        "LeftAnti" in p,
        "never a collected per-user item set",
    )

    p = explain_str(
        user_similarities(inter, hot_item_cap=1000)
    )
    check(
        "cf_user_similarities",
        "hot-item cap keep-list is broadcast",
        "BroadcastExchange" in p,
        "the sub-cap item list is tiny by construction; the guard must "
        "not add a corpus shuffle",
    )

    # the driver entries persist the distilled matrix (entry_queries_r11
    # _INTER_CACHE); with it cached the four consuming branches must read
    # the in-memory frame, not re-scan the raw event log per branch
    inter_cached = inter.persist()
    inter_cached.count()
    p = explain_str(user_based_recs(inter_cached, n_neighbors=5, k=3))
    dumps.append(("cf user_based_recs (interactions persisted)", p))
    import re as _re

    # formatted explain reprints the cached relation's DEFINITION (incl.
    # its parquet scan) under every InMemoryTableScan — execution reads
    # the cache; assert all scans are that one node, not fresh scans
    distinct_scans = set(_re.findall(r"Scan parquet\s*\((\d+)\)", p))
    check(
        "cf_user_based_recs",
        "persisted matrix: branches hit the cache, log scanned ≤1×",
        "InMemoryTableScan" in p and len(distinct_scans) <= 1,
        "the 12 per-branch log scans collapse onto one cached frame — "
        "the 100 TB-critical move (the matrix is tiny next to the log)",
    )

    # --------------------------------------- round-5: hybrid recommender
    from news_information_retrieval_system_spark.ops.recommend_hybrid import (
        content_scores,
        hybrid_weighted,
        item_popularity,
    )
    from news_information_retrieval_system_spark.query.vsm import (
        build_tfidf_weights,
    )

    cfr = user_based_recs(inter_cached, n_neighbors=5, k=15).select(
        "user_id", "doc_key", "score"
    )
    cont = content_scores(inter_cached, build_tfidf_weights(idx))
    p = explain_str(
        hybrid_weighted(cfr, cont, item_popularity(inter_cached), k=5)
    )
    dumps.append(("hybrid_weighted (content + CF + popularity blend)", p))
    check(
        "hybrid_weighted",
        "popularity dim broadcast into the blend",
        "BroadcastHashJoin" in p,
        "per-item popularity is catalog-sized; the candidate frame must "
        "not shuffle to meet it",
    )
    check(
        "hybrid_weighted",
        "final top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "",
    )
    check(
        "hybrid_weighted",
        "no cartesian product",
        "CartesianProduct" not in p,
        "the content pair scan is a term equi-join; the blend is a "
        "(user, doc) full-outer equi-join",
    )
    inter_cached.unpersist()

    # ------------------------------------------- round-5: search-log rollups
    from news_information_retrieval_system_spark.ops.search_log import (
        search_log_digest,
        search_log_from_events,
    )

    p = explain_str(search_log_digest(search_log_from_events(events_full)))
    dumps.append(("search_log_digest (three rollups stacked)", p))
    check(
        "search_log_digest",
        "rollups combine map-side",
        "partial_count" in p,
        "each branch exchanges one row per key per map partition",
    )
    check(
        "search_log_digest",
        "all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )

    # --------------------------------------- round-5: cluster→topic labels
    from news_information_retrieval_system_spark.ops.cluster import (
        cluster_label_terms,
    )

    asn = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", (F.col("vec_id") % 8).cast("int").alias("cluster")
    )
    weights = idx.postings.join(
        idx.term_stats.select("term", "idf"), "term"
    ).select(
        "doc_id", "term", ((F.lit(1.0) + F.log10("tf")) * F.col("idf")).alias("w")
    )
    p = explain_str(cluster_label_terms(asn, weights, top_terms=8))
    dumps.append(("cluster_label_terms (centroid TF-IDF labels)", p))
    check(
        "cluster_label_terms",
        "cluster sizes broadcast into the weight aggregation",
        "BroadcastExchange" in p,
        "k rows — must never shuffle the (cluster, term) frame to join them",
    )
    check(
        "cluster_label_terms",
        "centroid sums combine map-side",
        "partial_sum" in p,
        "",
    )
    check(
        "cluster_label_terms",
        "per-cluster top-terms rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "",
    )

    # ------------------------------------------- round-5: taxonomy dims
    from news_information_retrieval_system_spark.ops.contract import (
        taxonomy_cols,
    )

    recs = spark.read.parquet(docs_path).select(
        "doc_id", F.col("source").alias("category")
    )
    p = explain_str(taxonomy_cols(recs))
    dumps.append(("taxonomy_cols (dim-table normalization)", p))
    check(
        "taxonomy_cols",
        "all dim lookups broadcast (no record-side shuffle)",
        p.count("BroadcastExchange") >= 3 and "Exchange hashpartitioning" not in p,
        "alias exact + alias lowercased + topic label are literal dims; "
        "the record side must pass through shuffle-free",
    )
    check(
        "taxonomy_cols",
        "all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p,
        "",
    )

    # ------------------------------------------- round-5: SERP post-passes
    from news_information_retrieval_system_spark import (
        entry_queries_r12 as R12,
    )

    p = explain_str(R12.q_mmr_topk(spark, sf_dir))
    dumps.append(("mmr_topk (MMR diversification)", p))
    check(
        "mmr_topk",
        "pool selection pushes top-k (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "the candidate pool is a per-query top-30 — partial rank before "
        "the exchange, same as every *_topk plan",
    )
    check(
        "mmr_topk",
        "pool membership broadcast into the weight table",
        "BroadcastExchange" in p,
        "pairwise sims replicate only the ≤30 pool docs per query, never "
        "the full TF-IDF weight table",
    )
    check(
        "mmr_topk",
        "greedy loop is Arrow-batched per query group",
        "FlatMapGroupsInPandas" in p and "BatchEvalPython" not in p,
        "one applyInPandas group per query over a pool×pool matrix — "
        "bounded state, no row-at-a-time Python, no driver collect",
    )
    check(
        "mmr_topk",
        "no cartesian product",
        "CartesianProduct" not in p,
        "the a<b pool self-join is an equi-join on (query_id, term)",
    )

    p = explain_str(R12.q_deleted_bm25(spark, sf_dir))
    dumps.append(("deleted_bm25 (tombstone-masked BM25)", p))
    check(
        "deleted_bm25",
        "tombstone set broadcast into every anti-join",
        "BroadcastHashJoin" in p and "LeftAnti" in p,
        "the deletion mask is tiny next to the corpus — postings/doc/"
        "stats filtering must never shuffle the big side",
    )
    check(
        "deleted_bm25",
        "per-query top-k rank pushdown (WindowGroupLimit)",
        "WindowGroupLimit" in p,
        "masking must not break the bm25_topk plan shape",
    )
    check(
        "deleted_bm25",
        "no cartesian product",
        "CartesianProduct" not in p,
        "stats recompute uses the broadcast 1-row cross join only",
    )

    p = explain_str(R12.q_collapsed_topk(spark, sf_dir))
    dumps.append(("collapsed_topk (duplicate collapse)", p))
    check(
        "collapsed_topk",
        "no cartesian product",
        "CartesianProduct" not in p,
        "hash groups come from an equi-join on doc_id",
    )
    check(
        "collapsed_topk",
        "all JVM (no Python eval)",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        and "FlatMapGroupsInPandas" not in p,
        "md5 + windows are native expressions end to end",
    )

    spark.stop()

    # ------------------------------------------------------------- report
    lines = [
        "# PLANS — audited physical plans for the headline operators",
        "",
        "Generated by `scripts/plan_audit.py` (exits non-zero on any FAIL;",
        "re-run per round). Each check is a property the plan must keep for",
        "the 100 TB scale story to hold — see the script docstring.",
        "",
        "| plan | check | verdict | why it matters |",
        "|---|---|---|---|",
    ]
    n_fail = 0
    for plan, name, ok, note in results:
        v = "✅" if ok else "❌ FAIL"
        n_fail += 0 if ok else 1
        lines.append(f"| {plan} | {name} | {v} | {note} |")
    lines.append("")
    for title, dump in dumps:
        lines += [f"## {title}", "", "```", dump.rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(lines))
    for plan, name, ok, note in results:
        print(f"[{'OK' if ok else 'FAIL'}] {plan}: {name}")
    print(f"\nwrote PLANS.md ({len(results)} checks, {n_fail} failures)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
