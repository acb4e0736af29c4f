"""Two-parallelism scaling evidence for the positional-block build +
blocked phrase query.

Same methodology as scripts/scaling_report.py / scaling_pack.py
(CPU-pinned levels, fixed shuffle partitions, interleaved repeats,
min-reduced). The build plan is posexplode → one (term, block_key)
shuffle → applyInPandas encode: the shuffle volume is the token stream,
partitioned by a key whose doc-range component bounds every hot-term
group, so the expected efficiency is near-linear. The phrase query is a
term-pushdown scan + groupBy(block_key) kernel — embarrassingly parallel
by doc range.

Usage: python3 scripts/scaling_positional.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 1,000,000), SPARK_GRAFT_REPEATS (2),
     SPARK_GRAFT_SHUFFLE_PARTITIONS (64).
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
    from news_information_retrieval_system_spark.index.positional_blocks import (
        build_positional_blocks, phrase_match_blocks)
    from news_information_retrieval_system_spark.session import get_spark
    from pyspark.storagelevel import StorageLevel

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "1000000"))
    spark = get_spark("positional-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")
    # untimed warmup at 1/10 scale (python workers, Arrow codegen)
    wdocs = spark.read.parquet(ensure_corpus(spark, max(10_000, n_turns // 10)))
    wb = build_positional_blocks(wdocs.select("doc_id", "text"))
    phrase_match_blocks(wb, ["fast", "scan"]).count()

    t0 = time.time()
    blocks = build_positional_blocks(docs).persist(StorageLevel.MEMORY_AND_DISK)
    n_blocks = blocks.count()
    t_build = time.time() - t0

    t0 = time.time()
    n_hits = sum(
        phrase_match_blocks(blocks, p).count()
        for p in (["fast", "scan"], ["spark", "join"], ["window", "agg", "batch"])
    )
    t_query = time.time() - t0
    spark.stop()
    print(json.dumps({{"cores": cores, "build_sec": round(t_build, 3),
                       "query_sec": round(t_query, 3),
                       "n_blocks": n_blocks, "n_hits": n_hits}}))
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
    report = {}
    for phase in ("build", "query"):
        lo = min(r[f"{phase}_sec"] for r in lows)
        hi = min(r[f"{phase}_sec"] for r in highs)
        report[phase] = {
            "low_sec": lo,
            "high_sec": hi,
            "low_runs": [r[f"{phase}_sec"] for r in lows],
            "high_runs": [r[f"{phase}_sec"] for r in highs],
            "speedup": round(lo / hi, 3),
            "efficiency": round((lo / hi) / (high / low), 3),
        }
    print(json.dumps({
        "op": "positional_blocks",
        "turns": int(os.environ.get("SPARK_GRAFT_TURNS", "1000000")),
        "low_cores": low, "high_cores": high,
        "n_blocks": lows[0]["n_blocks"],
        **report,
    }))


if __name__ == "__main__":
    main()
