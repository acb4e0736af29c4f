"""Two-parallelism scaling evidence for the SDM batch ranker
(query/sdm.py: unigram LM + ordered/unordered positional pair features).

Same methodology as scripts/scaling_semdedup.py (CPU-pinned levels,
interleaved repeats, min-of-3 timed runs inside each JVM, min-reduced,
fixed shuffle partitions). Setup (untimed, identical bytes at both
levels via bench.ensure_corpus): flat index materialized + positional
frame persisted, then warmed with a small query subset so the timed
runs measure the SDM plan, not cache materialization.

The timed unit is the novel plan shape: per distinct query pair ONE
equi self-join of the positional frame on (pb, doc_id) — posting-list
sized, never a position explode — with ordered/unordered counts in JVM
higher-order functions, plus the unigram LM expansion and the two pair
feature aggregations. Every stage is keyed on doc_id or (pa, pb,
doc_id); query-side dims broadcast, so expected scaling is the WAND/
bm25_batch family's, not the build's.

Usage: python3 scripts/scaling_sdm.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 1,000,000), SPARK_GRAFT_REPEATS (2),
     SPARK_GRAFT_SDM_QUERIES (64), SPARK_GRAFT_SHUFFLE_PARTITIONS (64).
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
    from news_information_retrieval_system_spark.index.build import (
        build_index, build_positional)
    from news_information_retrieval_system_spark.query.bm25 import query_terms_df
    from news_information_retrieval_system_spark.query.sdm import (
        query_pairs_df, sdm_topk)
    from news_information_retrieval_system_spark.session import get_spark
    from pyspark.storagelevel import StorageLevel

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "1000000"))
    n_queries = int(os.environ.get("SPARK_GRAFT_SDM_QUERIES", "64"))
    spark = get_spark("sdm-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")

    # untimed setup: both index tables SDM reads, forced into cache
    idx = build_index(docs).materialize()
    pos = build_positional(docs).persist(StorageLevel.MEMORY_AND_DISK)
    pos.count()

    queries = bench_queries(n_queries)
    qt = query_terms_df(spark, queries).localCheckpoint(eager=True)
    qp = query_pairs_df(spark, queries).localCheckpoint(eager=True)

    # untimed warmup (codegen compile, broadcast + HOF paths) on a
    # 4-query subset against the already-cached frames
    wq = dict(list(queries.items())[:4])
    sdm_topk(idx, pos, query_terms_df(spark, wq),
             query_pairs_df(spark, wq), k=10).count()

    times, n_rows = [], 0
    for _ in range(3):
        t0 = time.time()
        n_rows = sdm_topk(idx, pos, qt, qp, k=10).count()
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
    n_queries = int(os.environ.get("SPARK_GRAFT_SDM_QUERIES", "64"))
    print(json.dumps({
        "op": "sdm_batch",
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
