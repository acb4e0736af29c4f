"""Two-parallelism scaling evidence for BPE tokenizer induction over a
REALISTIC-SIZE vocabulary (the corpus's own vocab is tiny at test SF).

The training state is vocab-sized, so the scaling unit is the per-round
cost over a large word table: generate N deterministic pseudo-words
(md5-hex prefixes, Zipf-ish freq), then time ``train_bpe_from_words``
for a fixed number of rounds with checkpoint_every=1 so every round
pays exactly one pair-aggregation + one merge map (no lazy re-execution
of earlier rounds inside the timed region).

Methodology identical to scaling_dupspans.py: CPU-pinned levels,
interleaved cross-JVM repeats, min-of-N timed runs inside each JVM,
modest fixed heap.

Usage: python3 scripts/scaling_bpe.py [low_cores] [high_cores]
Env: SPARK_GRAFT_BPE_WORDS (default 500,000), SPARK_GRAFT_BPE_MERGES
(default 8), SPARK_GRAFT_REPEATS (2), SPARK_GRAFT_INJVM_RUNS (3).
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
    from news_information_retrieval_system_spark.ops.bpe import (
        char_markers_col, train_bpe_from_words)
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_words = int(os.environ.get("SPARK_GRAFT_BPE_WORDS", "500000"))
    n_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "8"))
    n_runs = int(os.environ.get("SPARK_GRAFT_INJVM_RUNS", "3"))
    spark = get_spark("bpe-scaling", cores=cores)

    def vocab(n):
        # deterministic pseudo-words: 6-14 hex chars, Zipf-ish freqs
        return (spark.range(n)
            .select(
                F.substring(F.md5(F.col("id").cast("string")), 1,
                            (F.col("id") % 9 + 6).cast("int")).alias("word"),
                (F.lit(1000000) / (F.col("id") + 1)).cast("long")
                    .alias("freq"))
            .withColumn("freq", F.greatest("freq", F.lit(1)))
            .groupBy("word").agg(F.sum("freq").alias("freq"))
            .withColumn("enc", char_markers_col("word"))
            .localCheckpoint(eager=True))

    # untimed warmup at 1/10 scale
    train_bpe_from_words(vocab(max(10_000, n_words // 10)),
                         n_merges=n_merges, checkpoint_every=1)

    words = vocab(n_words)
    n_vocab = words.count()
    times = []
    for _ in range(n_runs):
        t0 = time.time()
        merges, _ = train_bpe_from_words(words, n_merges=n_merges,
                                         checkpoint_every=1)
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "sec": min(times),
                       "runs_in_jvm": times, "n_vocab": n_vocab,
                       "n_rules": len(merges)}}))
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
    n_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "8"))
    print(json.dumps({
        "op": "train_bpe_from_words",
        "n_vocab": lows[0]["n_vocab"],
        "n_merges": n_merges,
        "low_cores": low, "high_cores": high,
        "low_sec": lo, "high_sec": hi,
        "low_runs": [r["runs_in_jvm"] for r in lows],
        "high_runs": [r["runs_in_jvm"] for r in highs],
        "low_rounds_per_sec": round(n_merges / lo, 3),
        "high_rounds_per_sec": round(n_merges / hi, 3),
        "speedup": round(lo / hi, 3),
        "efficiency": round((lo / hi) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
