"""Two-parallelism scaling evidence (the sandbox stand-in for the north
rule's N vs 4N executor-cluster criterion).

Runs bench.py twice in fresh JVMs — local[N] and local[4N] with
spark.sql.shuffle.partitions scaled proportionally (session.get_spark ties
it to cores) — on the IDENTICAL input, then writes BENCH/BASELINE.md with
throughput at both levels and scaling efficiency
(T_low / T_high) / (cores_high / cores_low) per phase.

Usage: python3 scripts/scaling_report.py [low_cores] [high_cores]
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
    # big enough that compute dominates fixed per-stage overheads (Python
    # worker spin-up, task scheduling) — the regime the 4N criterion is about
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_TURNS=os.environ.get("SPARK_GRAFT_TURNS", "2000000"),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def min_of(runs: list[dict]) -> dict:
    """Per-phase minimum across repeats — the least-noise estimate on a
    shared box (GC / page-cache effects only ever ADD time)."""
    best = dict(runs[0])
    best["queries"] = {
        ph: min(r["queries"][ph] for r in runs) for ph in runs[0]["queries"]
    }
    return best


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ratio = high / low
    r_low = min_of([run_bench(low, sf_dir) for _ in range(repeats)])
    r_high = min_of([run_bench(high, sf_dir) for _ in range(repeats)])
    for r in (r_low, r_high):  # recompute throughput from min-phase times
        q = r["queries"]
        r["build_turns_per_sec"] = round(
            r["turns"] / (q["build_flat"] + q["build_blocked"]), 1
        )
        r["qps_bm25"] = round(256 / q["bm25_batch"], 2)
        if "bm25_docpart" in q:
            r["qps_docpart"] = round(256 / q["bm25_docpart"], 2)
        r["qps_wand"] = round(256 / q["wand_batch"], 2)

    def eff(phase: str) -> float:
        return round((r_low["queries"][phase] / r_high["queries"][phase]) / ratio, 3)

    phases = list(r_low["queries"])
    build_low = r_low["queries"]["build_flat"] + r_low["queries"]["build_blocked"]
    build_high = r_high["queries"]["build_flat"] + r_high["queries"]["build_blocked"]
    lines = [
        "# BENCH/BASELINE — scaling evidence",
        "",
        f"Generated {date.today()} by `scripts/scaling_report.py {low} {high}`.",
        "",
        "The north rule's two-cluster-size criterion (N vs 4N executors,",
        "efficiency ≥ 0.8) is evidenced here by running the identical job on",
        f"identical input at two parallelism levels: `local[{low}]` vs",
        f"`local[{high}]`, with `spark.sql.shuffle.partitions` scaled with",
        "cores. Efficiency = (T_low / T_high) / (cores_high / cores_low).",
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
    e_build = round((build_low / build_high) / ratio, 3)
    lines += [
        f"| **index build (flat+blocked)** | {round(build_low,3)} | "
        f"{round(build_high,3)} | {round(build_low/build_high,2)}× | {e_build} |",
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
    (out_dir / "BASELINE.md").write_text("\n".join(lines))
    print(f"wrote {out_dir / 'BASELINE.md'}; build efficiency={e_build}")


if __name__ == "__main__":
    main()
