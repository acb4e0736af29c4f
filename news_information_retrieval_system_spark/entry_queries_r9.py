"""Round-4 (session 3) driver-contract entries.

* semantic_dedup — SemDeDup embedding-cluster near-dup pruning
  (ops/semdedup.py): deterministic k-means quantization, within-cluster
  cosine-≥τ drop rule, smallest id per group survives. The oracle
  re-derives the FULL pipeline — every Lloyd iteration (shared
  ``lloyd_prefix`` builder), the final assignment, the within-cluster
  pair scan, and the survivor flags — from first principles in DuckDB.

Constants live here so the Spark entry and the SQL oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------- SemDeDup
# tau=0.3 sits above the corpus' 99th-percentile pairwise cosine (~0.29 at
# sf0.01) but below the within-cluster tail, so the drop set is non-trivial
# without planted fixtures; 3 Lloyd iterations keep the oracle's CTE chain
# short while still moving every centroid off its seed.
SD_K, SD_ITERS, SD_TAU = 8, 3, 0.3


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.semdedup import semantic_dedup

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(vecs, k=SD_K, n_iters=SD_ITERS, tau=SD_TAU)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("kept").cast("long").alias("kept"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}


def _semdedup_oracle() -> str:
    from .entry_queries_r4 import lloyd_prefix

    return (
        lloyd_prefix(SD_K, SD_ITERS)
        + f""",
fin AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_cosine_similarity(v.e, c.c), 9) DESC,
                                       c.cluster ASC) AS rk
    FROM v CROSS JOIN c{SD_ITERS} c
  ) WHERE rk = 1
),
fv AS MATERIALIZED (
  SELECT f.vec_id, f.cluster, v.e FROM fin f JOIN v USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM fv a JOIN fv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 9) >= {SD_TAU}
)
SELECT cast(f.vec_id AS BIGINT) AS vec_id,
       cast(f.cluster AS BIGINT) AS cluster,
       cast(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM fin f LEFT JOIN dropped d USING (vec_id)"""
    )


ORACLES["semantic_dedup"] = _semdedup_oracle()


def registry() -> dict:
    return {
        "semantic_dedup": q_semantic_dedup,
    }
