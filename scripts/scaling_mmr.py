"""Two-parallelism scaling evidence for MMR diversification
(query/diversify.py mmr_rerank: BM25 pool → pairwise TF-IDF cosine →
greedy per-query Arrow kernel).

Same methodology as scripts/scaling_sdm.py (CPU-pinned levels,
interleaved repeats, min-of-3 timed runs inside each JVM, min-reduced,
fixed shuffle partitions). Setup (untimed): flat index + TF-IDF weight
table materialized, small-subset warmup for codegen + Arrow paths.

The timed unit is the full post-retrieval pass for a query batch: BM25
scoring, per-query top-30 pool (WindowGroupLimit), pool-membership
broadcast into the weight table, the (query_id, term) equi self-join
for pairwise sims, and one applyInPandas group per query running the
greedy loop. Per-query work is O(pool·terms + pool²) regardless of
corpus size, so expected scaling is the query-batch family's.

Usage: python3 scripts/scaling_mmr.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 1,000,000), SPARK_GRAFT_REPEATS (2),
     SPARK_GRAFT_MMR_QUERIES (256), SPARK_GRAFT_SHUFFLE_PARTITIONS (64).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_DRIVER = textwrap.dedent(
    """
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    from bench import bench_queries, ensure_corpus
    from news_information_retrieval_system_spark.index.build import build_index
    from news_information_retrieval_system_spark.query.bm25 import (
        query_terms_df, score_bm25)
    from news_information_retrieval_system_spark.query.diversify import mmr_rerank
    from news_information_retrieval_system_spark.query.vsm import (
        build_tfidf_weights)
    from news_information_retrieval_system_spark.session import get_spark
    from pyspark.storagelevel import StorageLevel

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "1000000"))
    n_queries = int(os.environ.get("SPARK_GRAFT_MMR_QUERIES", "256"))
    spark = get_spark("mmr-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")

    # untimed setup: the two tables every MMR pass reads, forced to cache
    idx = build_index(docs).materialize()
    weights = build_tfidf_weights(idx).persist(StorageLevel.MEMORY_AND_DISK)
    weights.count()

    queries = bench_queries(n_queries)
    qt = query_terms_df(spark, queries).localCheckpoint(eager=True)

    # untimed warmup (codegen + Arrow kernel) on a 4-query subset
    wq = query_terms_df(spark, dict(list(queries.items())[:4]))
    mmr_rerank(score_bm25(idx, wq), weights, k=10, pool=30).count()

    times, n_rows = [], 0
    for _ in range(3):
        t0 = time.time()
        n_rows = mmr_rerank(
            score_bm25(idx, qt), weights, k=10, pool=30).count()
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "scan_sec": min(times),
                       "runs_in_jvm": times, "n_rows": n_rows}}))
    """
)


def run_level(cores: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"
        ),
    )
    env.setdefault("SPARK_DRIVER_MEM", "4g")
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
           _DRIVER.format(repo=str(REPO))]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    lows, highs = [], []
    for _ in range(repeats):  # interleaved — see scaling_report.py
        lows.append(run_level(low))
        highs.append(run_level(high))
    lo = min(r["scan_sec"] for r in lows)
    hi = min(r["scan_sec"] for r in highs)
    n_queries = int(os.environ.get("SPARK_GRAFT_MMR_QUERIES", "256"))
    print(json.dumps({
        "op": "mmr_batch",
        "turns": int(os.environ.get("SPARK_GRAFT_TURNS", "1000000")),
        "n_queries": n_queries,
        "n_rows": lows[0]["n_rows"],
        "low_cores": low, "high_cores": high,
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["scan_sec"] for r in lows],
        "high_runs": [r["scan_sec"] for r in highs],
        "low_qps": round(n_queries / lo, 2),
        "high_qps": round(n_queries / hi, 2),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
