"""Round-4 (session 3) driver-contract entries.

* bm25f_topk — BM25F weighted multi-field ranking (query/bm25f.py): the
  principled form of the reference's additive field boost
  (search_service.py:434-481) — per-field length-normalized tf, weighted
  and summed BEFORE k1 saturation. Fields are derived deterministically
  from the documents table (title = first {BM25F_TITLE_LEN} tokens,
  content = remainder) with the reference's title/content weights, and
  the oracle re-derives the full per-field pipeline in SQL.
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


# ----------------------------------------------------------------- BM25F
# Reference title/content weights (search_service.py:434-481); tags and
# category have no counterpart column in the synthetic corpus.
BM25F_TITLE_LEN = 8
BM25F_WEIGHTS = {"title": 0.45, "content": 0.06}
_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .entry_queries import B, K1, TOPK, _docs, _e5, _qterms
    from .query.bm25f import score_bm25f
    from .query.bm25 import topk

    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    rest_len = F.greatest(F.size(toks) - F.lit(BM25F_TITLE_LEN), F.lit(0))
    fielded = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(F.slice(toks, 1, BM25F_TITLE_LEN), " ").alias("title"),
        F.array_join(
            F.slice(toks, F.lit(BM25F_TITLE_LEN + 1), rest_len), " "
        ).alias("content"),
    )
    scored = score_bm25f(
        fielded, _qterms(spark), field_weights=BM25F_WEIGHTS, k1=K1, b=B
    ).withColumn("score", F.round("score", 9))
    return topk(scored, k=TOPK).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5(),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}


def _bm25f_oracle() -> str:
    from .entry_queries import B, K1, TOPK, _qterms_values_sql

    wt, wc = BM25F_WEIGHTS["title"], BM25F_WEIGHTS["content"]
    return f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
fields AS (
  SELECT doc_id, 'title' AS field, toks[1:{BM25F_TITLE_LEN}] AS ftoks FROM base
  UNION ALL
  SELECT doc_id, 'content' AS field, toks[{BM25F_TITLE_LEN + 1}:] AS ftoks FROM base
),
fdl AS (SELECT doc_id, field, len(ftoks) AS dl FROM fields),
favg AS (SELECT field, avg(dl) AS avgdl FROM fdl GROUP BY field),
ftf AS (
  SELECT doc_id, field, term, count(*) AS tf
  FROM (SELECT doc_id, field, unnest(ftoks) AS term FROM fields)
  GROUP BY doc_id, field, term
),
stats AS (SELECT cast(count(*) AS DOUBLE) AS n_docs FROM base),
df AS (SELECT term, cast(count(DISTINCT doc_id) AS DOUBLE) AS df
       FROM ftf GROUP BY term),
idf AS (SELECT term, ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM df CROSS JOIN stats s),
wtf AS (
  SELECT f.doc_id, f.term,
         sum((CASE f.field WHEN 'title' THEN {wt} ELSE {wc} END) * f.tf /
             (1 - {B} + {B} * d.dl / a.avgdl)) AS wtf
  FROM ftf f
  JOIN fdl d ON f.doc_id = d.doc_id AND f.field = d.field
  JOIN favg a ON f.field = a.field
  GROUP BY f.doc_id, f.term
),
{_qterms_values_sql()},
scored AS (
  SELECT q.query_id, w.doc_id,
         round(sum(q.qtf * idf.idf * (w.wtf * ({K1} + 1)) / ({K1} + w.wtf)), 9)
           AS score
  FROM q JOIN idf USING (term) JOIN wtf w USING (term)
  GROUP BY q.query_id, w.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}"""


ORACLES["bm25f_topk"] = _bm25f_oracle()


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
        "bm25f_topk": q_bm25f_topk,
    }
