"""Two-parallelism scaling evidence for the CSoundex find_similar scan.

Same methodology as scripts/scaling_report.py / scaling_pack.py /
scaling_positional.py (CPU-pinned levels, interleaved repeats,
min-reduced). The workload is the full phonetic-expansion path: per-turn
signature encode (a narrow per-row expression chain — tokenize, pinyin
parse, bucket lookup ×4) followed by the broadcast similarity scan
(query side broadcast, zip-similarity, threshold, per-query top-k with
the WindowGroupLimit rank pushdown). Both phases are embarrassingly
parallel over candidate partitions — the only exchange is the final
per-query k-way rank merge, whose volume is partition-count-independent
(≤ k rows per query per partition) — so the expected efficiency is
near-linear.

Usage: python3 scripts/scaling_csoundex.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 1,000,000), SPARK_GRAFT_REPEATS (2).
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
    from bench import ensure_corpus
    from news_information_retrieval_system_spark.entry_queries_r7 import (
        _signature_col)
    from news_information_retrieval_system_spark.ops.csoundex import (
        find_similar)
    from news_information_retrieval_system_spark.session import get_spark
    from pyspark.sql import functions as F

    QUERIES = [
        ("q1", "fast table scan data"), ("q2", "data scan table fast"),
        ("q3", "spark join window agg"), ("q4", "filter group order limit"),
        ("q5", "hash merge sort batch"), ("q6", "read write cache spill"),
        ("q7", "plan stage task core"), ("q8", "key value row column"),
    ]

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "1000000"))
    spark = get_spark("csoundex-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")
    qdf = (spark.createDataFrame(QUERIES, "query_id string, qtext string")
           .select("query_id",
                   _signature_col(F.col("qtext")).alias("csoundex")))

    def scan(d):
        cands = d.select(
            "doc_id", _signature_col(F.col("text")).alias("csoundex"))
        return find_similar(qdf, cands, threshold=0.5, topk=10).count()

    # untimed warmup at 1/10 scale (codegen compile, page cache)
    scan(spark.read.parquet(ensure_corpus(spark, max(10_000, n_turns // 10)))
         .select("doc_id", "text"))

    t0 = time.time()
    n_rows = scan(docs)
    t_scan = time.time() - t0
    spark.stop()
    print(json.dumps({{"cores": cores, "scan_sec": round(t_scan, 3),
                       "n_rows": n_rows}}))
    """
)


def run_level(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
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
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "1000000"))
    print(json.dumps({
        "op": "csoundex_find_similar",
        "turns": n_turns,
        "low_cores": low, "high_cores": high,
        "n_rows": lows[0]["n_rows"],
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["scan_sec"] for r in lows],
        "high_runs": [r["scan_sec"] for r in highs],
        "low_turns_per_sec": round(n_turns / lo, 1),
        "high_turns_per_sec": round(n_turns / hi, 1),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
