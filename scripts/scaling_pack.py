"""Two-parallelism scaling evidence for the sequence-packing operator.

Same methodology as scripts/scaling_report.py (CPU-pinned levels, fixed
shuffle partitions, interleaved repeats, min-reduced): pack_sequences
over the cached deterministic transcript corpus at two core counts.
The plan is one range exchange + per-partition sort + a narrow Arrow
cumsum pass seeded by a P-row driver aggregate — nothing in it is
proportional to anything but the data, so the expected efficiency
is near-linear.

Usage: python3 scripts/scaling_pack.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 4,000,000), SPARK_GRAFT_REPEATS (2),
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
    from news_information_retrieval_system_spark.ops.curation import pack_sequences
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "4000000"))
    spark = get_spark("pack-scaling", cores=cores)
    path = ensure_corpus(spark, n_turns)
    docs = spark.read.parquet(path).select("doc_id", "text")
    # untimed warmup at 1/10 scale: python-worker spin-up + codegen
    wpath = ensure_corpus(spark, max(10_000, n_turns // 10))
    pack_sequences(spark.read.parquet(wpath).select("doc_id", "text"),
                   seq_len=2048).count()
    t0 = time.time()
    n = pack_sequences(docs, seq_len=2048, num_ranges=max(64, cores * 8)).count()
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({{"cores": cores, "sec": round(dt, 3), "rows": n,
                       "turns_per_sec": round(n / dt, 1)}}))
    """
)


def run_pack(cores: int) -> dict:
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
        lows.append(run_pack(low))
        highs.append(run_pack(high))
    lo = min(r["sec"] for r in lows)
    hi = min(r["sec"] for r in highs)
    eff = (lo / hi) / (high / low)
    print(json.dumps({
        "phase": "pack_sequences",
        "turns": lows[0]["rows"],
        "low_cores": low, "high_cores": high,
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["sec"] for r in lows],
        "high_runs": [r["sec"] for r in highs],
        "speedup": round(lo / hi, 3),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
