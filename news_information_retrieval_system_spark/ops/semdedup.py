"""Semantic deduplication (SemDeDup): embedding-cluster near-dup pruning.

The LLM-curation counterpart of the lexical near-dup stack (ops/dedup.py):
instead of shingling text, cluster the embedding space with deterministic
k-means and drop, within each cluster, every vector that has a
higher-than-``tau`` cosine neighbor with a smaller id (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — the published algorithm is exactly cluster-then-prune).
The reference's content-based stack builds the same doc-vector space
(src/ir/cluster/content_based.py:131-166) and its dedup service stops at
lexical equality (src/ir_app/services/document_service.py:150-166); this
op is the embedding-space extension a training-data pipeline needs.

Why clustering first: all-pairs cosine is O(N²·dim) and unrunnable at
corpus scale. SemDeDup bounds the quadratic term to within-cluster pairs
— O(Σ_c |c|²) — and ``k`` is the dial: pick k ∝ N/target_cluster_size and
per-cluster work stays constant as the corpus grows. The within-cluster
join is keyed on ``cluster``, so it shuffles once and each cluster's
pairs are produced by one partition's worth of co-located rows.

Determinism / oracle discipline (same as ops/cluster.py): k-means seeds
are the k smallest ids, cosines round to 9dp before the ``tau``
comparison, the drop rule ("a smaller-id neighbor exists") is
order-free — an independent SQL engine reproduces the survivor set
exactly.

Scale guards: a pathological cluster (skewed embedding mass) would make
its |c|² term explode; ``max_cluster_rows`` fail-fasts with the cluster
histogram (k rows on the driver) instead of silently launching a
quadratic join — the same guard discipline as HAC's ``max_docs`` and
bm25_docpart's ``max_closure_rows``. Zero-norm embeddings score 0.0
against everything (assign_to_centroids' guard), so they land in the
lowest cluster and are never dropped (cos 0.0 < tau for any tau > 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import (
    _dot,
    _norm,
    _prep_vecs,
    _round9,
    assign_to_centroids,
    kmeans_fit,
)


def semantic_dedup(
    vecs: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 200_000,
) -> DataFrame:
    """→ (vec_id, cluster, kept): deterministic SemDeDup over an
    embedding column. ``kept = 0`` iff some same-cluster vector with a
    SMALLER id has cosine ≥ ``tau`` (9dp-rounded) — i.e. each near-dup
    group keeps exactly its smallest id.

    One k-means pass (k×dim driver state), one cluster-keyed self-join
    bounded by ``max_cluster_rows``, one left_anti-style flag join.
    """
    spark = vecs.sparkSession
    v = _prep_vecs(vecs, id_col, vec_col).persist()
    centroids = kmeans_fit(v, k=k, n_iters=n_iters)
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, cvec array<double>",
    )
    assigned = assign_to_centroids(v, cdf).persist()

    sizes = assigned.groupBy("cluster").count().collect()  # k rows
    worst = max((r["count"] for r in sizes), default=0)
    if worst > max_cluster_rows:
        v.unpersist()
        assigned.unpersist()
        raise ValueError(
            f"semantic_dedup: largest cluster has {worst} rows > "
            f"max_cluster_rows={max_cluster_rows}; raise k (bound the "
            "within-cluster quadratic term) or the guard"
        )

    a = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("va"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vb"),
    )
    na, nb = _norm(F.col("va")), _norm(F.col("vb"))
    denom = na * nb
    cos = F.when(denom > 0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(
        F.lit(0.0)
    )
    dropped = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_round9(cos) >= F.lit(tau))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    out = (
        assigned.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("_d").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
        .localCheckpoint(eager=True)
    )
    v.unpersist()
    assigned.unpersist()
    return out
