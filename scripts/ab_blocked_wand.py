"""Interleaved A/B at local[32], sf0.1 corpus: the two phases BENCH_r02
regressed vs round 1.

A: build_blocked — raw_shuffle (v1 plan) vs segment-then-merge (v2) vs
   auto-select (round-3 probe) on the SAME cached postings.
B: wand_batch — fused single-collect θ seed (round 3) vs seed_theta=False
   (no-seed lower bound) on the SAME cached blocks. The r2 three-job seed
   no longer exists in the tree; the no-seed run bounds what seeding must
   beat.

Ordering matters: the blocked-build section runs and is timed BEFORE any
blocks DataFrame is persisted — Spark's CacheManager matches plan
subtrees, so persisting a segment-merge `blocks` first would silently
serve the timed segment-merge run from cache (observed: 0.35s bogus).
Only after section A completes do we persist blocks for the wand section.

Interleaved min-of-N (default 2), one JVM, warm codegen/python workers —
the same-day same-session comparison VERDICT.md asked for.

Usage: python3 scripts/ab_blocked_wand.py [turns] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import bench_queries, ensure_corpus  # noqa: E402
from news_information_retrieval_system_spark.index.build import build_index  # noqa: E402
from news_information_retrieval_system_spark.index.segments import (  # noqa: E402
    build_blocked_postings,
)
from news_information_retrieval_system_spark.query.bm25 import query_terms_df  # noqa: E402
from news_information_retrieval_system_spark.query.wand import wand_topk  # noqa: E402
from news_information_retrieval_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-blocked-wand", cores=cores)
    path = ensure_corpus(spark, turns)
    docs = spark.read.parquet(path).select("doc_id", "text")
    idx = build_index(docs)
    idx.materialize()
    n_docs, avgdl = idx.scalar_stats()

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    results: dict[str, list[float]] = {}

    def record(name, fn):
        results.setdefault(name, []).append(timed(fn))

    # --- section A: blocked build (nothing blocked is persisted yet) ---
    # warmup both kernels once (codegen + python workers), no persist
    build_blocked_postings(idx.postings, term_dict=idx.term_stats, raw_shuffle=True).count()
    build_blocked_postings(idx.postings, term_dict=idx.term_stats, raw_shuffle=False).count()
    for _ in range(repeats):
        record(
            "blocked_raw_shuffle",
            lambda: build_blocked_postings(
                idx.postings, term_dict=idx.term_stats, raw_shuffle=True
            ).count(),
        )
        record(
            "blocked_segment_merge",
            lambda: build_blocked_postings(
                idx.postings, term_dict=idx.term_stats, raw_shuffle=False
            ).count(),
        )
        record(
            "blocked_auto",
            lambda: build_blocked_postings(
                idx.postings, term_dict=idx.term_stats
            ).count(),
        )

    # --- section B: wand seed A/B over persisted blocks ---
    blocks = build_blocked_postings(
        idx.postings, term_dict=idx.term_stats, raw_shuffle=False
    ).persist()
    blocks.count()
    qdf = query_terms_df(spark, bench_queries(256)).persist()
    qidf = qdf.join(idx.term_stats.select("term", "idf"), "term").persist()
    qidf.count()
    # warmup both wand paths
    wand_topk(blocks, qidf, n_docs, avgdl, k=10).count()
    wand_topk(blocks, qidf, n_docs, avgdl, k=10, seed_theta=False).count()
    for _ in range(repeats):
        record(
            "wand_fused_seed",
            lambda: wand_topk(blocks, qidf, n_docs, avgdl, k=10).count(),
        )
        record(
            "wand_no_seed",
            lambda: wand_topk(
                blocks, qidf, n_docs, avgdl, k=10, seed_theta=False
            ).count(),
        )
    out = {
        "turns": turns,
        "cores": cores,
        "repeats": repeats,
        "times": results,
        "min": {k: min(v) for k, v in results.items()},
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
