"""Emit the registry/rotation ledger numbers from the live registry so
COVERAGE.md cannot drift from __spark_entry__ (VERDICT r4 "What's
wrong" #3: hand-typed counts disagreed with the registry).

Prints: total registered entries, the driver window (first 50), the
park list, orphans (registry names missing from _PRIORITY — they'd sort
behind everything), stale priorities (_PRIORITY names not in the
registry), and which parked entries are members of an in-window suite
digest (re-verified this round despite being parked).

Usage: python3 scripts/coverage_counts.py [--names]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from news_information_retrieval_system_spark.entry_queries_suites import (  # noqa: E402
    SUITES,
)

WINDOW = 50


def main() -> int:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)
    window, parked = names[:WINDOW], names[WINDOW:]
    prio = entrymod._PRIORITY
    orphans = [n for n in names if n not in prio]
    stale = [n for n in prio if n not in qs]
    no_oracle = [n for n in names if n not in oracles]
    in_window_suites = [s for s in SUITES if s in window]
    digest_covered = sorted(
        m
        for s in in_window_suites
        for m in SUITES[s]
        if m in parked
    )
    print(f"registered entries: {len(names)}")
    print(f"oracle-backed: {len(names) - len(no_oracle)}"
          + (f" (rows-only: {no_oracle})" if no_oracle else ""))
    print(f"driver window (first {WINDOW}): {len(window)}")
    print(f"parked: {len(parked)}")
    print(f"in-window suite digests: {in_window_suites}")
    print(
        f"parked but digest-re-verified via an in-window suite: "
        f"{len(digest_covered)}"
    )
    print(
        "effective ops value-checked this round: "
        f"{len(window) + len(digest_covered)}"
    )
    if orphans:
        print(f"WARNING registry names missing from _PRIORITY: {orphans}")
    if stale:
        print(f"WARNING stale _PRIORITY names: {stale}")
    if "--names" in sys.argv:
        print("\n-- window --")
        for n in window:
            print(f"  {n}")
        print("-- parked --")
        for n in parked:
            mark = " [digest-covered]" if n in digest_covered else ""
            print(f"  {n}{mark}")
    return 1 if (orphans or stale or no_oracle) else 0


if __name__ == "__main__":
    sys.exit(main())
