"""Pin the ALS drift-gate: run q_als_factors in N fresh JVMs at sf0.01
and, if all runs agree exactly, print the ``_ALS_EXPECTED`` literal for
entry_queries_r11.py (pinned-VALUES drift-gate pattern: lda_topics /
ltr_train_coefs). Exits non-zero on any cross-run drift.

Usage: python3 scripts/pin_als.py [n_runs]
"""

from __future__ import annotations

import subprocess
import sys

_CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
from news_information_retrieval_system_spark.session import get_spark
from news_information_retrieval_system_spark.entry_queries_r11 import q_als_factors

spark = get_spark("pin-als", cores=8)
rows = q_als_factors(spark, "/root/testdata/sf0.01").collect()
for r in sorted((r["doc_key"], r["pos"], r["weight_e3"]) for r in rows):
    print("ROW", *r)
spark.stop()
"""


def one_run() -> list[tuple[int, int, int]]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit("child JVM failed")
    rows = []
    for line in out.stdout.splitlines():
        if line.startswith("ROW "):
            _, d, p, w = line.split()
            rows.append((int(d), int(p), int(w)))
    return rows


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = [one_run() for _ in range(n_runs)]
    for i, r in enumerate(runs[1:], start=2):
        if r != runs[0]:
            diff = [
                (a, b) for a, b in zip(runs[0], r) if a != b
            ]
            print(f"DRIFT between run 1 and run {i}: {diff[:10]}")
            return 1
    print(f"stable across {n_runs} fresh JVMs ({len(runs[0])} rows)")
    print("_ALS_EXPECTED = [")
    for d, p, w in runs[0]:
        print(f"    ({d}, {p}, {w}),")
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
