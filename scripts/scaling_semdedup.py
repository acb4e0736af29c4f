"""Two-parallelism scaling evidence for semantic_dedup (SemDeDup:
embedding-cluster near-dup pruning).

Same methodology as scripts/scaling_dupspans.py (CPU-pinned levels,
interleaved repeats, min-of-3 timed runs inside each JVM, min-reduced).

Workload shape: N synthetic 64-dim embeddings (deterministic xxhash64
per-component values — identical bytes at every parallelism level), k
chosen so the average cluster holds ~N/k ≈ 200 rows. The timed op runs
the FULL pipeline: n_iters Lloyd passes (each a broadcast k-centroid
assignment scan + one posexplode centroid update), the cluster-size
guard aggregate, the cluster-keyed within-cluster pair scan
(Σ|c|² ≈ N·(N/k) cosine evaluations), and the survivor-flag join. All
stages are either narrow scans or keyed on ``cluster`` — per-cluster
work is constant when k scales with N, which is the 100 TB contract.

Usage: python3 scripts/scaling_semdedup.py [low_cores] [high_cores]
Env: SPARK_GRAFT_VECS (default 50,000), SPARK_GRAFT_REPEATS (2).
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
    from news_information_retrieval_system_spark.ops.semdedup import (
        semantic_dedup)
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_vecs = int(os.environ.get("SPARK_GRAFT_VECS", "50000"))
    k = max(8, n_vecs // 200)
    spark = get_spark("semdedup-scaling", cores=cores)

    def vecs(n):
        # deterministic pseudo-random embeddings in [-1, 1): identical
        # bytes at every parallelism level (hash of (vec_id, position)).
        emb = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda p: (F.xxhash64(F.col("vec_id"), p) % 1000) / 500.0 - 1.0,
        )
        return (
            spark.range(n).select(F.col("id").alias("vec_id"))
            .repartition(max(cores * 4, 8))
            .select("vec_id", emb.alias("embedding"))
            .localCheckpoint(eager=True)
        )

    # untimed warmup at 1/10 scale (codegen compile, broadcast paths)
    semantic_dedup(vecs(max(2000, n_vecs // 10)),
                   k=max(8, n_vecs // 2000), n_iters=3, tau=0.9).count()

    v = vecs(n_vecs)
    times, n_dropped = [], 0
    for _ in range(3):
        t0 = time.time()
        out = semantic_dedup(v, k=k, n_iters=3, tau=0.9)
        n_dropped = out.filter(F.col("kept") == 0).count()
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "scan_sec": min(times),
                       "runs_in_jvm": times, "k": k,
                       "n_dropped": n_dropped}}))
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
    lo = min(r["scan_sec"] for r in lows)
    hi = min(r["scan_sec"] for r in highs)
    n_vecs = int(os.environ.get("SPARK_GRAFT_VECS", "50000"))
    print(json.dumps({
        "op": "semantic_dedup",
        "vecs": n_vecs,
        "k": lows[0]["k"],
        "n_dropped": lows[0]["n_dropped"],
        "low_cores": low, "high_cores": high,
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["scan_sec"] for r in lows],
        "high_runs": [r["scan_sec"] for r in highs],
        "low_vecs_per_sec": round(n_vecs / lo, 1),
        "high_vecs_per_sec": round(n_vecs / hi, 1),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
