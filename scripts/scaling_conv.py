"""Two-parallelism scaling evidence for the conversation-grain rollup
family (ops/transcripts.py: conversation_stats + conversation_dedup).

Same methodology as the other scaling_*.py harnesses: CPU-pinned
levels (taskset), interleaved JVM repeats, min-of-3 timed runs inside
each JVM, min-reduced across JVMs.

Workload shape: N synthetic transcript turns in the input_hint schema —
conv_id = id // 8 (8-turn conversations), alternating roles, a mod-5
tool pattern, and ~40-token texts generated per (text_seed, turn_idx,
position) from xxhash64 so the bytes are identical at every parallelism
level. ~10% of conversations copy their predecessor's text
(text_seed = conv_id - 1 when conv_id % 10 == 7), so whole-conversation
dedup has real duplicate groups to find. The timed op runs BOTH
conversation_stats (one groupBy of conditional sums over tokenized
turns) and conversation_dedup (sort_array collect_list fingerprint +
first-seen-wins window) — the two single-shuffle-on-conv_id rollups,
which is the 100 TB contract: work per conversation is constant, the
only exchange is keyed on conv_id, and under a conv-bucketed ingest
layout even that exchange disappears.

Usage: python3 scripts/scaling_conv.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 2,000,000), SPARK_GRAFT_REPEATS (2).
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
    from news_information_retrieval_system_spark.ops.transcripts import (
        conversation_dedup, conversation_stats)
    from news_information_retrieval_system_spark.session import get_spark

    cores = int(os.environ["SPARK_GRAFT_CPUS"])
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "2000000"))
    spark = get_spark("conv-scaling", cores=cores)

    def turns(n):
        cid = F.floor(F.col("id") / 8)
        # ~10% of conversations copy their predecessor's text wholesale
        seed = F.when(cid % 10 == 7, cid - 1).otherwise(cid)
        text = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda p: F.concat(
                    F.lit("t"),
                    F.pmod(
                        F.xxhash64(seed, F.col("id") % 8, p), F.lit(5000)
                    ).cast("string"),
                ),
            ),
            " ",
        )
        return (
            spark.range(n)
            .repartition(max(cores * 4, 8))
            .select(
                F.concat(F.lit("c"), cid.cast("string")).alias("conv_id"),
                (F.col("id") % 8).cast("int").alias("turn_idx"),
                F.when(F.col("id") % 2 == 0, "user")
                .otherwise("assistant").alias("role"),
                text.alias("text"),
                F.when(F.col("id") % 5 == 2, "search")
                .when(F.col("id") % 5 == 4, "python")
                .otherwise("").alias("tool"),
            )
            .localCheckpoint(eager=True)
        )

    def job(t):
        conversation_stats(t).select(
            F.sum("total_tokens"), F.sum("n_tool_calls")).collect()
        return conversation_dedup(t).filter(F.col("is_dup") == 1).count()

    # untimed warmup at 1/10 scale (codegen compile, shuffle paths)
    job(turns(max(20000, n_turns // 10)))

    t = turns(n_turns)
    times, n_dups = [], 0
    for _ in range(3):
        t0 = time.time()
        n_dups = job(t)
        times.append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({{"cores": cores, "scan_sec": min(times),
                       "runs_in_jvm": times, "n_dups": n_dups}}))
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
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "2000000"))
    print(json.dumps({
        "op": "conversation_rollups",
        "turns": n_turns,
        "n_dup_convs": lows[0]["n_dups"],
        "low_cores": low, "high_cores": high,
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
