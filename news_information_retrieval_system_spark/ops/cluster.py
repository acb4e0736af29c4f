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


def _prep_vecs(vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )


def assign_to_centroids(v: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, vec) × broadcast (cluster, cvec) → nearest-centroid
    assignment (vec_id, cluster, vec). Zero-norm guard (same as
    pairwise_cosine): a zero/empty embedding scores 0.0 against every
    centroid and lands in the lowest cluster id deterministically,
    instead of a NULL cosine silently falling through to NULLS-LAST."""
    denom = _norm(F.col("vec")) * _norm(F.col("cvec"))
    scored = v.crossJoin(F.broadcast(cdf)).withColumn(
        "cos",
        _round9(
            F.when(denom > 0, _dot(F.col("vec"), F.col("cvec")) / denom)
            .otherwise(F.lit(0.0))
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cluster"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cluster", "vec")
    )


def kmeans_fit(
    v: DataFrame,
    k: int = 8,
    n_iters: int = 5,
) -> list[list[float]]:
    """Lloyd iterations over a prepped (vec_id, vec) frame → the final
    k centroids (driver-side k×dim floats — the only rows ever
    collected). Caller owns persistence of ``v``."""
    spark = v.sparkSession
    # seeds = the k smallest ids, cluster id = rank. Two steps so the
    # TakeOrdered heap carries only longs (per-partition top-k of id-only
    # rows → O(partitions·k·8B) to driver), then a broadcast semi-join
    # fetches just the k seed vectors — never the full vector column
    # through a sort (at 100 TB that heap would ship partitions·k·dim
    # doubles to the driver).
    seed_ids = [r["vec_id"] for r in v.select("vec_id").orderBy("vec_id").limit(k).collect()]
    init = v.filter(F.col("vec_id").isin(seed_ids)).orderBy("vec_id").collect()
    centroids = [list(r["vec"]) for r in init]
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cluster int, cvec array<double>",
        )
        assigned = assign_to_centroids(v, cdf)
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
    return centroids


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
    # scanned once per Lloyd iteration — cache, release at the end
    v = _prep_vecs(vecs, id_col, vec_col).persist()
    centroids = kmeans_fit(v, k=k, n_iters=n_iters)
    final = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, cvec array<double>",
    )
    out = assign_to_centroids(v, final).select("vec_id", "cluster")
    # release the iteration cache: the returned (lazy) plan re-reads the
    # source once when consumed — no persisted handle leaks to the caller
    v.unpersist()
    return out


def cluster_label_terms(
    assignments: DataFrame,
    weights: DataFrame,
    top_terms: int = 8,
    id_col: str = "vec_id",
    doc_col: str = "doc_id",
    weight_col: str = "w",
    rank_dp: int = 9,
) -> DataFrame:
    """→ (cluster, n_docs, kw_rank, term, cw): label each cluster with
    the top TF-IDF terms of its centroid — the cluster→topic composition
    (src/ir_app/services/cluster_topic_service.py:130-214: centroid =
    mean of the members' TF-IDF vectors, keywords = its top terms, the
    topic label joins the top 3).

    ``assignments`` is (id_col, cluster) — typically ``kmeans_assign``
    output; ``weights`` is (doc_col, term, weight_col) — typically the
    ``doc_keywords`` weight frame. The centroid weight of a term is
    ``Σ member weights / cluster size`` (members missing the term
    contribute 0, exactly the reference's sparse-mean centroid), rounded
    to ``rank_dp`` before ranking so independent engines agree on
    near-ties.

    Scale shape: one join from assignments into the weight frame (both
    partitioned by doc), one partial-aggregating groupBy on (cluster,
    term), and a top-``top_terms`` window per cluster (WindowGroupLimit)
    — k·top_terms result rows, no driver loops."""
    sizes = assignments.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    member_w = assignments.select(
        F.col(id_col).alias(doc_col), "cluster"
    ).join(weights, doc_col)
    summed = member_w.groupBy("cluster", "term").agg(
        F.sum(weight_col).alias("sw")
    )
    cw = summed.join(F.broadcast(sizes), "cluster").withColumn(
        "cw", F.round(F.col("sw") / F.col("n_docs"), rank_dp)
    )
    win = Window.partitionBy("cluster").orderBy(F.desc("cw"), F.asc("term"))
    return (
        cw.withColumn("kw_rank", F.row_number().over(win))
        .filter(F.col("kw_rank") <= top_terms)
        .select("cluster", "n_docs", "kw_rank", "term", "cw")
    )


# ------------------------------------------------------ hierarchical (HAC)
def pairwise_cosine(
    vectors, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """All-pairs cosine (id_a < id_b, sim) — the distributed O(n²·dim)
    stage of HAC (reference _compute_pairwise_similarities,
    doc_cluster.py:390-405). JVM zip_with/aggregate, no Python.
    Zero-norm (or empty) embeddings get similarity 0.0 to every vector
    rather than a divide-by-zero (ANSI mode) or a NULL that would poison
    the merge loop."""
    base = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", _norm(F.col("v")))
    a = base.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    denom = F.col("na") * F.col("nb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.when(denom > 0, _dot(F.col("va"), F.col("vb")) / denom)
            .otherwise(F.lit(0.0))
            .alias("sim"),
        )
    )


_LINKAGES = ("single", "complete", "average")


def hierarchical_doc_clusters(
    vectors,
    k: int,
    linkage: str = "complete",
    max_docs: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """HAC over the embedding column → (doc_id, cluster).

    Reference semantics (doc_cluster.py:252-374): merge the most-similar
    cluster pair (single=max / complete=min / average=mean of cross-pair
    doc similarities) until k remain; strictly-greater comparison over
    cluster pairs in creation order gives the reference's deterministic
    tie-break; final cluster ids are assigned in cluster-creation order,
    exactly like its enumerate-over-insertion-order relabeling.

    Split: the O(n²·dim) similarity matrix is computed DISTRIBUTED
    (pairwise_cosine); the merge loop is driver-side, as in the
    reference, but tracks per-cluster-pair (sum, count, min, max) stats
    and combines them on merge — each round costs O(c²) dict work
    instead of re-enumerating every cross doc-pair (the reference's
    O(n²) per round), with identical linkage values (min/max exactly;
    the average's sum associates differently, same multiset). HAC is a
    bounded-corpus algorithm whose *default shape* is driver-bound —
    ``max_docs`` guards against feeding it a 100 TB table; at that scale
    use ``kmeans_assign`` (distributed Lloyd) or
    ``ops.semdedup.semantic_dedup`` (cluster-bounded near-dup pruning).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if linkage not in _LINKAGES:
        raise ValueError(f"unknown linkage: {linkage!r} (choose {_LINKAGES})")
    vectors = vectors.persist()  # three jobs below read the same plan
    try:
        ids = sorted(r[0] for r in vectors.select(id_col).collect())
        n = len(ids)
        if n > max_docs:
            raise ValueError(
                f"HAC is O(n^3) with an O(n^2) driver-side merge state: "
                f"{n} docs > max_docs={max_docs}. This is a driver-bound "
                "reference-parity op; at corpus scale use kmeans_assign "
                "(distributed Lloyd) or semantic_dedup (cluster-bounded "
                "near-dup pruning), or sample/filter first."
            )
        doc_pairs = pairwise_cosine(vectors, id_col, vec_col).collect()
    finally:
        vectors.unpersist()

    spark = vectors.sparkSession
    if k >= n:
        return spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(ids)], "doc_id long, cluster long"
        )

    cid_of = {d: i for i, d in enumerate(ids)}
    # per-cluster-pair stats over cross doc sims: (sum, count, min, max)
    stats: dict[tuple[int, int], list] = {}
    for r in doc_pairs:
        key = (cid_of[r["id_a"]], cid_of[r["id_b"]])
        s = r["sim"]
        stats[(min(key), max(key))] = [s, 1, s, s]

    clusters: dict[int, set] = {i: {d} for i, d in enumerate(ids)}
    next_id = n

    def score(st):
        if st is None:
            return 0.0  # reference: no cross sims recorded → 0.0
        if linkage == "single":
            return st[3]
        if linkage == "complete":
            return st[2]
        return st[0] / st[1]

    while len(clusters) > k:
        best_pair, best_sim = None, -float("inf")
        keys = list(clusters.keys())  # creation order (dict insertion)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                kk = (min(keys[i], keys[j]), max(keys[i], keys[j]))
                s = score(stats.get(kk))
                if s > best_sim:
                    best_sim, best_pair = s, (keys[i], keys[j])
        c1, c2 = best_pair
        merged = clusters.pop(c1) | clusters.pop(c2)
        # combine the merged pair's stats against every surviving cluster
        for other in clusters:
            combined = None
            for old in (c1, c2):
                kk = (min(old, other), max(old, other))
                st = stats.pop(kk, None)
                if st is None:
                    continue
                if combined is None:
                    combined = list(st)
                else:
                    combined = [
                        combined[0] + st[0],
                        combined[1] + st[1],
                        min(combined[2], st[2]),
                        max(combined[3], st[3]),
                    ]
            if combined is not None:
                stats[(min(next_id, other), max(next_id, other))] = combined
        stats.pop((min(c1, c2), max(c1, c2)), None)
        clusters[next_id] = merged
        next_id += 1

    assign = [
        (int(d), cid)
        for cid, doc_set in enumerate(clusters.values())
        for d in sorted(doc_set)
    ]
    return spark.createDataFrame(assign, "doc_id long, cluster long")
