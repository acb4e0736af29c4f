"""Document clustering: deterministic Lloyd k-means (SURVEY §2 A6).

Reference: src/ir/cluster/doc_cluster.py:451-598 — k-means with cosine
-similarity assignment and mean-vector centroid updates over document
vectors (the reference clusters TF dicts; its content-based stack also
builds TF-IDF / BERT-embedding vectors, content_based.py:131-166 — this
engine applies the identical algorithm to the dense ``embedding``
column). Differences, made for determinism at scale:

* init: centroids are the vectors of the k SMALLEST ids (the reference
  samples randomly, doc_cluster.py:500-505 — a random init cannot be
  oracle-verified);
* fixed ``n_iters`` Lloyd iterations instead of a convergence test
  (doc_cluster.py:529-575);
* empty clusters keep their previous centroid (same as the reference's
  fallback, doc_cluster.py:549-557 first branch).

Spark shape: the per-iteration state is just the k×dim centroid matrix —
it lives on the driver (k·dim doubles, broadcast back each iteration);
assignment is a broadcast cross-join + JVM ``zip_with`` dot products
(no Python in the N-scaled path); centroid update is one
posexplode/groupBy(cluster, pos) average. Work per iteration: one scan
of the vectors, one k·dim-row collect. Determinism discipline: cosines
are rounded to 9dp before the argmax (ties → lowest cluster id) and
centroid components snap to a 9dp grid every iteration, so an
independent SQL re-implementation reproduces assignments exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _round9(col):
    return F.round(col, 9)


def kmeans_assign(
    vecs: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, cluster): deterministic k-means assignment after
    ``n_iters`` Lloyd iterations (see module docstring for the exact
    semantics an oracle must mirror)."""
    spark = vecs.sparkSession
    v = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).persist()  # scanned once per Lloyd iteration — cache, release at the end
    init = (
        v.orderBy("vec_id").limit(k).orderBy("vec_id").collect()
    )  # k smallest ids, cluster id = rank
    centroids = [list(r["vec"]) for r in init]

    def assign(cdf: DataFrame) -> DataFrame:
        scored = v.crossJoin(F.broadcast(cdf)).withColumn(
            "cos",
            _round9(
                _dot(F.col("vec"), F.col("cvec"))
                / (_norm(F.col("vec")) * _norm(F.col("cvec")))
            ),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cluster"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "cluster", "vec")
        )

    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cluster int, cvec array<double>",
        )
        assigned = assign(cdf)
        new_rows = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(_round9(F.avg("x")).alias("x"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "x"))),
                    lambda s: s["x"],
                ).alias("cvec")
            )
            .collect()
        )
        by_cluster = {r["cluster"]: list(r["cvec"]) for r in new_rows}
        centroids = [by_cluster.get(i, centroids[i]) for i in range(k)]

    final = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, cvec array<double>",
    )
    out = assign(final).select("vec_id", "cluster")
    # release the iteration cache: the returned (lazy) plan re-reads the
    # source once when consumed — no persisted handle leaks to the caller
    v.unpersist()
    return out
