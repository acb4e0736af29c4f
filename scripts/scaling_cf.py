"""Two-parallelism scaling evidence for the collaborative-filtering
recommender (`user_based_recs`: interaction distillation → sparse
user×user cosine via the doc-keyed self-join → top-n neighbors →
similarity-weighted vote with consumed-item anti-join → top-k).

Methodology matches scaling_curate.py: CPU-pinned levels (taskset),
interleaved cross-JVM repeats, min-of-N timed runs inside each JVM,
pinned 4 GB heap. The cost centre is the pair join — Σ_d n_d² pair rows
before the (ua, ub) combine — so the fixture controls per-doc fan-out
directly: U users × K interactions over D docs, doc popularity uniform
by construction (xxhash64 spread), per-doc users ≈ U·K/D.

Usage: python3 scripts/scaling_cf.py [low_cores] [high_cores]
Env: SPARK_GRAFT_CF_USERS (default 50,000), SPARK_GRAFT_CF_DOCS
(20,000), SPARK_GRAFT_CF_K (10), SPARK_GRAFT_REPEATS (2),
SPARK_GRAFT_INJVM_RUNS (3).
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
    from pyspark.sql import functions as F
    from news_information_retrieval_system_spark.ops.recommend_cf import (
        user_based_recs)
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_users = int(os.environ.get("SPARK_GRAFT_CF_USERS", "50000"))
    n_docs = int(os.environ.get("SPARK_GRAFT_CF_DOCS", "20000"))
    k_inter = int(os.environ.get("SPARK_GRAFT_CF_K", "10"))
    n_runs = int(os.environ.get("SPARK_GRAFT_INJVM_RUNS", "3"))
    spark = get_spark("cf-scaling", cores=cores)

    def synth_inter(u):
        # deterministic synthetic interaction matrix: each user touches
        # k_inter xxhash64-spread docs with a small integer rating; the
        # groupBy dedupes hash collisions identically at every level
        base = spark.range(u).select(F.col("id").alias("user_id"))
        expl = base.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(k_inter - 1))).alias("i"))
        return (
            expl.select(
                "user_id",
                (F.abs(F.xxhash64("user_id", "i")) % n_docs).alias("doc_key"),
                ((F.col("user_id") + F.col("i")) % 900 + 100).alias("rating"))
            .groupBy("user_id", "doc_key")
            .agg(F.max("rating").alias("rating")))

    # untimed warmup at 1/10 user count (codegen compile, shuffle warm)
    w = synth_inter(max(2000, n_users // 10)).persist()
    w.count()
    user_based_recs(w, n_neighbors=20, k=10).count()
    w.unpersist()

    inter = synth_inter(n_users).persist()
    n_inter = inter.count()
    times, n_recs = [], 0
    for _ in range(n_runs):
        t0 = time.time()
        n_recs = user_based_recs(inter, n_neighbors=20, k=10).count()
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "sec": min(times),
                       "runs_in_jvm": times, "n_inter": n_inter,
                       "n_recs": n_recs}}))
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
    n_users = int(os.environ.get("SPARK_GRAFT_CF_USERS", "50000"))
    print(json.dumps({
        "op": "user_based_recs",
        "users": n_users,
        "docs": int(os.environ.get("SPARK_GRAFT_CF_DOCS", "20000")),
        "k_inter": int(os.environ.get("SPARK_GRAFT_CF_K", "10")),
        "n_inter": lows[0]["n_inter"],
        "n_recs": lows[0]["n_recs"],
        "low_cores": low, "high_cores": high,
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["runs_in_jvm"] for r in lows],
        "high_runs": [r["runs_in_jvm"] for r in highs],
        "low_users_per_sec": round(n_users / lo, 1),
        "high_users_per_sec": round(n_users / hi, 1),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
