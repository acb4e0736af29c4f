from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.semdedup import semantic_dedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_duplicates_drop_higher_id(spark):
    # Two tight groups + singletons. Exact copies score cosine 1.0; the
    # smallest id in each group must be the sole survivor.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (10, [1.0, 0.0, 0.0, 0.0]),       # copy of 0
        (20, [0.99, 0.01, 0.0, 0.0]),     # near-copy of 0
        (1, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),       # copy of 1
        (2, [0.0, 0.0, 1.0, 0.0]),        # singleton
        (3, [0.0, 0.0, 0.0, 1.0]),        # singleton
    ]
    out = semantic_dedup(_vecs(spark, rows), k=4, n_iters=2, tau=0.95)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert kept[0] == 1 and kept[10] == 0 and kept[20] == 0
    assert kept[1] == 1 and kept[11] == 0
    assert kept[2] == 1 and kept[3] == 1


def test_cross_cluster_pairs_never_compared(spark):
    # With k == n and well-separated vectors every row is its own cluster,
    # so even tau=0 (everything "similar") drops nothing: the quadratic
    # scan is provably bounded to within-cluster pairs.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
    ]
    out = semantic_dedup(_vecs(spark, rows), k=3, n_iters=2, tau=0.0)
    assert [r["kept"] for r in out.orderBy("vec_id").collect()] == [1, 1, 1]
    clusters = {r["cluster"] for r in out.collect()}
    assert len(clusters) == 3


def test_zero_norm_vectors_survive(spark):
    # Zero embeddings score 0.0 against everything (guarded cosine) —
    # they must never be dropped, and two of them must not drop each other.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
    ]
    out = semantic_dedup(_vecs(spark, rows), k=2, n_iters=1, tau=0.5)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert kept[0] == 1 and kept[1] == 1 and kept[2] == 1


def test_cluster_size_guard_failfast(spark):
    rows = [(i, [1.0, float(i % 3) * 1e-6]) for i in range(10)]
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_dedup(_vecs(spark, rows), k=1, n_iters=1, tau=0.99,
                       max_cluster_rows=4)


def test_sf0001_matches_bruteforce(spark):
    # End-to-end at sf0.001: the drop set must equal a brute-force
    # within-cluster recomputation done with independent Spark SQL.
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(vecs, k=4, n_iters=2, tau=0.3).persist()
    v = vecs.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    a = out.join(v, "vec_id").select(
        F.col("cluster"), F.col("vec_id").alias("ia"), F.col("e").alias("ea")
    )
    b = out.join(v, "vec_id").select(
        F.col("cluster"), F.col("vec_id").alias("ib"), F.col("e").alias("eb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0),
                    lambda acc, x: acc + x)
    )
    pairs = (
        a.join(b, ["cluster"])
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("cos", F.round(dot / (nrm(F.col("ea")) * nrm(F.col("eb"))), 9))
        .filter(F.col("cos") >= 0.3)
    )
    expect_dropped = {r["ib"] for r in pairs.select("ib").distinct().collect()}
    got_dropped = {r["vec_id"] for r in out.filter(F.col("kept") == 0).collect()}
    assert got_dropped == expect_dropped
    out.unpersist()
