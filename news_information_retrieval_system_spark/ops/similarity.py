"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k: JVM-side dot products via
  higher-order ``aggregate``/``zip_with`` (no Python), broadcast query
  side, window top-k. The correctness baseline.
* ``lsh_cosine_topk`` — random-hyperplane LSH buckets as the scale path:
  sign-bit sketches via one Arrow-batched numpy matmul, candidates =
  bucket collisions across a few probe permutations, exact re-rank of
  candidates only. Recall < 1 by construction; brute force is the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _norm_col(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query vector ids.
    → (query_id, rank, vec_id, cosine). Excludes self-matches."""
    base = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", _norm_col(F.col("v")))
    q = (
        base.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    scored = (
        base.join(F.broadcast(q), how="cross")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def rademacher_signs(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """±1 hyperplane matrix (dim × n_planes). Sign projections lose nothing
    for LSH bucketing, and the integer entries make the bucket function
    exactly reproducible by any engine fed the same matrix (the DuckDB
    oracle embeds it as a VALUES table)."""
    rng = np.random.default_rng(seed)
    return np.where(rng.random((dim, n_planes)) < 0.5, -1.0, 1.0)


def bucket_col(vec_col, signs: np.ndarray, round_dp: int = 6):
    """Pure-JVM bucket id: bit p = sign of ⟨v, signs[:,p]⟩. The dot is
    rounded before the sign test so engines that sum in different orders
    agree (sign margins must exceed 10^-round_dp; assert on your data).
    No Python worker, no shuffle — a row-local Column expression."""
    dim, n_planes = signs.shape
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        row = F.array(*[F.lit(float(s)) for s in signs[:, p]])
        dot = F.aggregate(
            F.zip_with(v, row, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(F.round(dot, round_dp) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        ).cast("long")
    return out


def make_bucket_udf(dim: int | None = None, n_planes: int = 16, seed: int = 42):
    """Hyperplane sign-bucket UDF. ``dim`` may be omitted: the plane matrix
    is a pure function of (seed, dim), so each executor derives it lazily
    from the first Arrow batch — no driver-side ``.first()`` action needed
    to sniff the embedding width."""
    cache: dict[int, np.ndarray] = {}
    if dim is not None:
        cache[dim] = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def bucket(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())  # (batch, dim)
        d = mat.shape[1]
        planes = cache.get(d)
        if planes is None:
            planes = cache[d] = _hyperplanes(d, n_planes, seed)
        signs = (mat @ planes) > 0  # (batch, n_planes)
        keys = np.packbits(signs, axis=1, bitorder="little")
        out = np.zeros(len(vs), dtype=np.int64)
        for i in range(keys.shape[1]):
            out |= keys[:, i].astype(np.int64) << (8 * i)
        return pd.Series(out)

    return bucket


def ivf_cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_list: int = 8,
    n_probe: int = 3,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path next to
    ``lsh_cosine_topk``: a coarse quantizer (deterministic k-means,
    ops.cluster semantics) partitions the corpus into ``n_list`` inverted
    lists; a query ranks the k×dim centroid table (broadcast, driver-side
    tiny) and exact-reranks ONLY the vectors in its ``n_probe`` nearest
    lists. → (query_id, rank, vec_id, cosine), self excluded.

    Scale shape: index assignment is one broadcast cross-join pass
    (row-local, no shuffle beyond the planner's); the probe join touches
    n_probe/n_list of the corpus per query. At 100 TB, persist the
    assignment as a partitioned table (cluster = partition key) so probes
    become partition-pruned scans. Recall < 1 by construction — the
    brute-force ``cosine_topk`` is the oracle baseline, and the
    deterministic quantizer (seeded ids, round-9 cosine, cluster-asc
    ties) makes the candidate set itself engine-reproducible."""
    from .cluster import _prep_vecs, assign_to_centroids, kmeans_fit

    spark = vectors.sparkSession
    v = _prep_vecs(vectors, id_col, vec_col).persist()
    centroids = kmeans_fit(v, k=n_list, n_iters=n_iters)
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, cvec array<double>",
    )
    assigned = assign_to_centroids(v, cdf).withColumn("norm", _norm_col(F.col("vec")))
    q = v.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
    ).withColumn("qnorm", _norm_col(F.col("qv")))
    # probe set: same metric + tie-break as the quantizer (round-9 cosine
    # desc, cluster asc) so an oracle reproduces the exact lists probed
    qdenom = _norm_col(F.col("qv")) * _norm_col(F.col("cvec"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cluster"))
    probes = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn(
            "ccos",
            F.round(
                F.when(qdenom > 0, _dot(F.col("qv"), F.col("cvec")) / qdenom)
                .otherwise(F.lit(0.0)),
                9,
            ),
        )
        .withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= n_probe)
        .select("query_id", "cluster", "qv", "qnorm")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot(F.col("vec"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
    # eager row so the persisted prep frame can be released deterministically
    out = out.localCheckpoint(eager=True)
    v.unpersist()
    return out


def lsh_cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's hyperplane
    sign bucket; exact cosine re-rank of candidates only."""
    bucket = make_bucket_udf(dim, n_planes, seed)
    base = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", bucket(F.col("v"))).withColumn("norm", _norm_col(F.col("v")))
    # multi-probe: the query also probes every bucket one sign-flip away
    # (n_planes + 1 keys) — the standard recall lever without more tables
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    q = (
        base.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(probes).alias("qbucket"),
        )
    )
    cand = (
        base.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "v", "norm", "qv", "qnorm")
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn(
            "cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
