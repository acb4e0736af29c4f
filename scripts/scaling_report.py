"""Two-parallelism scaling evidence (the sandbox stand-in for the north
rule's N vs 4N executor-cluster criterion).

Methodology (each point measured, see git history / README):

* Each bench run is CPU-PINNED (taskset) to exactly its core count — an
  unpinned local[N] on a bigger box lets GC threads and python workers
  overflow onto idle cores, flattering the small run and corrupting the
  ratio. A real N-core executor host gives the JVM + python workers N
  cores TOTAL; pinning reproduces that.
* `spark.sql.shuffle.partitions` is FIXED across both levels (real
  clusters size reducers to the data, not the cluster) so both levels run
  the identical plan; only executor slots differ.
* Repeats are INTERLEAVED (low, high, low, high) and min-reduced per
  phase: this VM class shows ±20-50%% run-to-run drift (host memory
  subsystem), and interleaving keeps the compared pairs in similar
  machine states. Minima are the least-noise estimator: contention only
  ever adds time.
* Core counts default to 2 vs 8: above ~16 cores this host's memory
  subsystem saturates (total CPU inflates ~3x on random-access hash
  aggregation), which measures the box, not the engine. 2-vs-8 keeps
  per-core resources constant so the ratio reflects plan scalability —
  the thing the N-vs-4N criterion is about.

Usage: python3 scripts/scaling_report.py [low_cores] [high_cores]
Env: SPARK_GRAFT_TURNS (default 2,000,000), SPARK_GRAFT_REPEATS (2),
     SPARK_GRAFT_SHUFFLE_PARTITIONS (64), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_bench(cores: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_TURNS=os.environ.get("SPARK_GRAFT_TURNS", "2000000"),
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"
        ),
        # north-rule phases only: the curation face has its own scaling
        # script (scripts/scaling_pack.py) and would dominate pinned
        # low-core wall budget here
        SPARK_GRAFT_CURATION="0",
    )
    cmd = [sys.executable, str(REPO / "bench.py")]
    pin = ["taskset", "-c", f"0-{cores - 1}"]
    out = subprocess.run(
        pin + cmd, env=env, capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def min_of(runs: list[dict]) -> dict:
    best = dict(runs[0])
    best["queries"] = {
        ph: min(r["queries"][ph] for r in runs) for ph in runs[0]["queries"]
    }
    return best


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ratio = high / low
    lows, highs = [], []
    for _ in range(repeats):  # interleaved pairs — see module docstring
        lows.append(run_bench(low, sf_dir))
        highs.append(run_bench(high, sf_dir))
    r_low, r_high = min_of(lows), min_of(highs)
    n_queries = int(os.environ.get("SPARK_GRAFT_QUERIES", "1024"))
    n_small = int(os.environ.get("SPARK_GRAFT_SMALL_QUERIES", str(min(256, n_queries))))
    n_naive = int(
        os.environ.get("SPARK_GRAFT_NAIVE_QUERIES", str(min(256, n_queries)))
    )
    for r in (r_low, r_high):  # recompute throughput from min-phase times
        q = r["queries"]
        r["build_turns_per_sec"] = round(
            r["turns"] / (q["build_flat"] + q["build_blocked"]), 1
        )
        r["qps_bm25"] = round(n_naive / q["bm25_batch"], 2)
        if "bm25_docpart_1024" in q:  # headline regime (bench.py r4)
            r["qps_docpart"] = round(n_queries / q["bm25_docpart_1024"], 2)
        elif "bm25_docpart" in q:
            r["qps_docpart"] = round(n_small / q["bm25_docpart"], 2)
        if "wand_batch_1024" in q:
            r["qps_wand"] = round(n_queries / q["wand_batch_1024"], 2)
        else:
            r["qps_wand"] = round(n_small / q["wand_batch"], 2)

    def eff(phase: str) -> float:
        return round((r_low["queries"][phase] / r_high["queries"][phase]) / ratio, 3)

    phases = list(r_low["queries"])
    build_low = r_low["queries"]["build_flat"] + r_low["queries"]["build_blocked"]
    build_high = r_high["queries"]["build_flat"] + r_high["queries"]["build_blocked"]
    qlow = r_low["queries"]
    qhigh = r_high["queries"]
    # headline query regime: the 1024-batch phases when bench.py emits
    # them (per-job fixed overhead amortized), else the small batch
    if "wand_batch_1024" in qlow:
        query_low = qlow["bm25_docpart_1024"] + qlow["wand_batch_1024"]
        query_high = qhigh["bm25_docpart_1024"] + qhigh["wand_batch_1024"]
    else:
        query_low = qlow["bm25_docpart"] + qlow["wand_batch"]
        query_high = qhigh["bm25_docpart"] + qhigh["wand_batch"]
    e_build = round((build_low / build_high) / ratio, 3)
    e_query = round((query_low / query_high) / ratio, 3)
    lines = [
        "# BENCH/BASELINE — scaling evidence",
        "",
        f"Generated {date.today()} by `scripts/scaling_report.py {low} {high}`.",
        "",
        "The north rule's two-cluster-size criterion (N vs 4N executors,",
        f"efficiency ≥ 0.8) is evidenced by running the identical job on",
        f"identical input at two CPU-PINNED parallelism levels: `taskset -c",
        f"0-{low - 1} local[{low}]` vs `taskset -c 0-{high - 1} local[{high}]`, with",
        "`spark.sql.shuffle.partitions` FIXED across levels (identical plan,",
        "different slot count — how a real cluster scales out). Pinning",
        "matters: unpinned, the small run's GC threads and python workers",
        "overflow onto idle cores and corrupt the ratio. Efficiency =",
        "(T_low / T_high) / (cores_high / cores_low); repeats interleaved,",
        "min-reduced (this VM class drifts ±20-50% run to run; see",
        "scripts/scaling_report.py docstring for the full methodology).",
        "",
        f"Input: deterministic synthetic transcripts, {r_low['turns']:,} turns"
        f" (sf={r_low['sf']}), {r_low['n_postings']:,} postings,"
        f" {r_low['n_blocks']:,} posting blocks.",
        "",
        f"| phase | local[{low}] sec | local[{high}] sec | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for ph in phases:
        tl, th = r_low["queries"][ph], r_high["queries"][ph]
        lines.append(f"| {ph} | {tl} | {th} | {round(tl/th, 2)}× | {eff(ph)} |")
    lines += [
        f"| **index build (flat+blocked)** | {round(build_low,3)} | "
        f"{round(build_high,3)} | {round(build_low/build_high,2)}× | {e_build} |",
        f"| **query batch (docpart+wand)** | {round(query_low,3)} | "
        f"{round(query_high,3)} | {round(query_low/query_high,2)}× | {e_query} |",
        "",
        "## Throughput",
        "",
        f"| metric | local[{low}] | local[{high}] |",
        "|---|---|---|",
        f"| build turns/sec | {r_low['build_turns_per_sec']} | {r_high['build_turns_per_sec']} |",
        f"| BM25 queries/sec (naive plan) | {r_low['qps_bm25']} | {r_high['qps_bm25']} |",
        f"| BM25 queries/sec (doc-partitioned) | {r_low.get('qps_docpart', '-')} | {r_high.get('qps_docpart', '-')} |",
        f"| WAND queries/sec | {r_low['qps_wand']} | {r_high['qps_wand']} |",
        "",
        "Reference single-node baseline (BASELINE.md): 1,103.9 docs/sec lexical",
        "index build. Raw JSON:",
        "",
        "```json",
        json.dumps(r_low),
        json.dumps(r_high),
        "```",
        "",
    ]
    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    # default to a dated report file; BENCH/BASELINE.md is hand-curated
    # across rounds and must not be clobbered by a single run
    out_name = os.environ.get("SPARK_GRAFT_REPORT_OUT", f"scaling_{date.today()}.md")
    (out_dir / out_name).write_text("\n".join(lines))
    print(
        f"wrote {out_dir / out_name}; build eff={e_build} query eff={e_query}"
    )


if __name__ == "__main__":
    main()
