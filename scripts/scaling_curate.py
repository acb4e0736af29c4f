"""Two-parallelism scaling evidence for the composed curation pipeline
(`curate_corpus`: lang gate → quality floor → exact dedup → MinHash+CC
near-dup → PII scrub → splits).

Same methodology as scaling_dupspans.py: CPU-pinned levels, interleaved
cross-JVM repeats, min-of-N timed runs INSIDE each JVM (the host's
first-touch fault storm lands in whichever run fills the heap first),
modest fixed heap. The pipeline's cost centre is the MinHash band
bucketing + verify join; every stage is either a narrow pass, a
map-side-combinable agg, or a banded join — nothing grows with
parallelism, so the expected efficiency tracks the shuffle fabric.

Usage: python3 scripts/scaling_curate.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 200,000), SPARK_GRAFT_REPEATS (2),
SPARK_GRAFT_INJVM_RUNS (default 3).
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
    from news_information_retrieval_system_spark.ops.pipeline import (
        curate_corpus)
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "200000"))
    n_runs = int(os.environ.get("SPARK_GRAFT_INJVM_RUNS", "3"))
    drop_mode = os.environ.get("SPARK_GRAFT_DROP_MODE", "low")
    spark = get_spark("curate-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")

    def plant_drops(frame, n):
        # realistic-drop fixture (~35% dropped): a third of the docs
        # become planted EXACT duplicates (2-member groups keyed by
        # (doc_id//3) % g so the keep-first window drops half), a third
        # become planted NEAR duplicates (group-specific 32-token
        # template + a ~4-token original tail -> within-group Jaccard
        # ~30 shared / ~42 union = 0.72 > threshold; shingles carry the
        # group marker so groups never collide into one giant bucket)
        from pyspark.sql import functions as F
        g = max(1, n // 6)
        grp = ((F.col("doc_id") / 3).cast("long") % g).cast("string")
        shared = F.concat(
            F.lit("shared corpus passage block "), grp,
            F.lit(" repeated content planted duplicate group"))
        marker = F.concat(F.lit("g"), grp)
        tmpl_toks = []
        for i, w in enumerate(
                "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi".split()):
            tmpl_toks += [marker, F.lit(w)]
        near = F.concat_ws(
            " ", *tmpl_toks,
            F.col("doc_id").cast("string"),
            F.substring("text", 1, 16))
        return frame.withColumn(
            "text",
            F.when(F.col("doc_id") % 3 == 1, shared)
            .when(F.col("doc_id") % 3 == 2, near)
            .otherwise(F.col("text")))

    if drop_mode == "high":
        docs = plant_drops(docs, n_turns)

    # untimed warmup at 1/10 scale (codegen compile, page cache)
    warm_n = max(10_000, n_turns // 10)
    warm = spark.read.parquet(ensure_corpus(spark, warm_n)).select(
        "doc_id", "text")
    if drop_mode == "high":
        warm = plant_drops(warm, warm_n)
    curate_corpus(warm, None, redact_pii=True)

    times, n_out = [], 0
    for _ in range(n_runs):
        t0 = time.time()
        out, stats = curate_corpus(docs, None, redact_pii=True)
        n_out = stats["n_kept"]
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "sec": min(times),
                       "runs_in_jvm": times, "n_out": n_out}}))
    """
)


def run_level(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
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
    lo = min(r["sec"] for r in lows)
    hi = min(r["sec"] for r in highs)
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "200000"))
    print(json.dumps({
        "op": "curate_corpus",
        "drop_mode": os.environ.get("SPARK_GRAFT_DROP_MODE", "low"),
        "turns": n_turns,
        "low_cores": low, "high_cores": high,
        "n_out": lows[0]["n_out"],
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["runs_in_jvm"] for r in lows],
        "high_runs": [r["runs_in_jvm"] for r in highs],
        "low_turns_per_sec": round(n_turns / lo, 1),
        "high_turns_per_sec": round(n_turns / hi, 1),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
