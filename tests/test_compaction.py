"""Size-tiered segment compaction: pure-logic planner tests + an
end-to-end equality check — load_merged_blocks returns the SAME merged
block table before and after compaction (compaction is semantically
idempotent; it only reduces live segment count)."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.segments import (
    build_resumable,
    compact_segments_dir,
    load_merged_blocks,
    plan_compaction,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(buckets_bytes, status="ok"):
    return [
        {"bucket": b, "status": status, "bytes": n, "doc_count": 1}
        for b, n in buckets_bytes
    ]


def test_plan_groups_small_tier_only():
    rows = _rows([(0, 100), (1, 200), (2, 300), (3, 400), (4, 500),
                  (5, 1 << 30)])
    # five segments in tier 0 (> max 4) merge; the 1 GiB one stays
    assert plan_compaction(rows, max_per_tier=4) == [[0, 1, 2, 3, 4]]


def test_plan_respects_supersession():
    rows = _rows([(b, 100) for b in range(6)])
    rows += [{"bucket": 0, "status": "superseded", "into": 9}]
    rows += _rows([(9, 600)])
    # bucket 0 retired → tier 0 holds 1..5 (5 live) + bucket 9
    assert plan_compaction(rows, max_per_tier=4) == [[1, 2, 3, 4, 5, 9]]
    assert plan_compaction(rows, max_per_tier=6) == []


def test_compaction_preserves_merged_blocks(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    out = str(tmp_path / "idx")
    build_resumable(spark, docs, out, num_buckets=6)
    cols = ["term", "block_key", "n", "min_doc", "max_doc", "max_tf", "min_dl"]
    before = sorted(map(tuple, load_merged_blocks(spark, out).select(cols).collect()))
    # every segment is tiny → all six land in tier 0 and merge into one
    res = compact_segments_dir(spark, out, max_per_tier=2)
    assert res["groups"] and res["groups"][0]["merged_from"] == [0, 1, 2, 3, 4, 5]
    assert res["live_segments"] == 1
    after = sorted(map(tuple, load_merged_blocks(spark, out).select(cols).collect()))
    assert before == after
    # idempotent: a second compaction run plans nothing
    assert compact_segments_dir(spark, out, max_per_tier=2)["groups"] == []
