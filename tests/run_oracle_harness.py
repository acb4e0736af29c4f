"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (rows sorted by all columns). Exits
non-zero on any mismatch.

Usage: python3 tests/run_oracle_harness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from news_information_retrieval_system_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype(object).where(pd.notnull(df), None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("oracle-harness", cores=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        got = sdf.toPandas()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        status = "OK"
        if list(g.columns) != list(w.columns):
            status = f"SCHEMA MISMATCH spark={list(g.columns)} duckdb={list(w.columns)}"
        elif len(g) != len(w):
            status = f"ROWCOUNT MISMATCH spark={len(g)} duckdb={len(w)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status = f"VALUE MISMATCH: {str(e)[:400]}"
        print(f"[{status.split()[0]}] {name}: {len(g)} rows")
        if status != "OK":
            failures.append((name, status))
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for name, status in failures:
            print(f"  {name}: {status}")
        return 1
    print("\nall queries match the DuckDB oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
