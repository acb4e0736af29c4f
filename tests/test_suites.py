"""Suite digests (entry_queries_suites.py): pinned member column lists
must match the live DataFrames (the digest hashes would silently cover
the wrong tuple otherwise), every member must stay string/bigint-only
(float casts don't render identically across engines), and the digest
must carry exactly the member row sets."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

from news_information_retrieval_system_spark.entry_queries_suites import (  # noqa: E402
    SUITES,
    member_digest,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pinned_columns_and_types_match_live(spark):
    base = entrymod.queries()
    for suite, members in SUITES.items():
        for name, pinned in members.items():
            df = base[name](spark, SF_DIR)
            assert pinned == sorted(df.columns), (suite, name)
            bad = [
                (c, t)
                for c, t in df.dtypes
                if t not in ("string", "bigint")
            ]
            assert not bad, (suite, name, bad)


def test_digest_rows_equal_member_rows(spark):
    base = entrymod.queries()
    members = SUITES["suite_digest_dedup"]
    digest = base["suite_digest_dedup"](spark, SF_DIR)
    per_entry = {
        r["entry"]: r["n"]
        for r in digest.groupBy("entry").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for name in members:
        n = base[name](spark, SF_DIR).count()
        # a member with zero rows contributes zero digest rows
        assert per_entry.get(name, 0) == n, name


def test_member_digest_null_sentinel(spark):
    df = spark.createDataFrame(
        [(1, None), (1, "∅x")], "a long, b string"
    )
    out = member_digest(df, "m", ["a", "b"]).collect()
    # NULL and a string merely containing the sentinel hash differently
    assert len({r["row_md5"] for r in out}) == 2
