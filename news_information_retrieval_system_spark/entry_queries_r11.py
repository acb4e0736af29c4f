"""Round-5 driver-contract entries: collaborative filtering, search-log
analytics, and cluster→topic labeling (VERDICT r4 "Next round" #3-#5).

* cf_user_recs / cf_item_recs — user- and item-based kNN collaborative
  filtering over the events interaction log (ops/recommend_cf.py,
  reference collaborative_filtering.py:187-458). Ratings quantize to
  integer centi-units so the sparse cosines are exact integer math in
  both engines; the oracles re-derive the interaction matrix, both
  similarity directions, neighbor selection, the consumed-item
  anti-join, and the similarity-normalized scores from first
  principles.
* als_factors — ``pyspark.ml`` ALS item factors (reference ALS MF,
  collaborative_filtering.py:460-639) as a pinned-VALUES drift gate
  (same discipline as lda_topics/ltr_train_coefs): the oracle pins the
  seeded, block-pinned factor output at sf0.01 so any regression in
  the deterministic training path shows up as a hash break.
* search_log_stats — top-query / zero-result-rate / result-count
  rollups (ops/search_log.py, reference search_log_service.py:11-93)
  stacked under a metric discriminator; the oracle re-derives the
  deterministic log view and every rollup.
* cluster_labels — k-means clusters labeled with their centroid's top
  TF-IDF terms (ops/cluster.py cluster_label_terms, reference
  cluster_topic_service.py:130-214); the oracle chains the shared Lloyd
  WITH-prefix with the shared tf/idf CTEs and re-derives the sparse
  centroid means.

Constants live here so the Spark entries and the SQL oracles cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _SQL_BASE, _index
from .entry_queries_r4 import KM_ITERS, KM_K, _e5, lloyd_prefix
from .ops.search_log import LOG_QUERY_MOD, LOG_RESULT_MOD

# ------------------------------------------------- A10 collaborative CF
CF_EVENT_TYPES = ("click", "view", "purchase")
CF_USER_NEIGHBORS = 20
CF_ITEM_NEIGHBORS = 10
CF_TOPK = 5


# the recommenders consume the interaction matrix from four plan
# branches (self-join a/b, norms, neighbor expansion, consumed-item
# anti-join); persist the distilled frame ONCE so the raw event log is
# scanned once, not 12× — the same move a cluster job makes at 100 TB,
# where the matrix is orders of magnitude smaller than the log
_INTER_CACHE: dict = {}


def _inter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.recommend_cf import interactions

    key = (id(spark), sf_dir)
    if key not in _INTER_CACHE:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        _INTER_CACHE[key] = interactions(
            events, event_types=CF_EVENT_TYPES
        ).persist()
    return _INTER_CACHE[key]


def _recs_out(out: DataFrame) -> DataFrame:
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("rec_rank").cast("long").alias("rec_rank"),
        F.col("doc_key").cast("long").alias("doc_id"),
        _e5("score", "score_5dp"),
    )


def q_cf_user_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.recommend_cf import user_based_recs

    return _recs_out(
        user_based_recs(
            _inter(spark, sf_dir), n_neighbors=CF_USER_NEIGHBORS, k=CF_TOPK
        )
    )


def q_cf_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.recommend_cf import item_based_recs

    return _recs_out(
        item_based_recs(
            _inter(spark, sf_dir), n_neighbors=CF_ITEM_NEIGHBORS, k=CF_TOPK
        )
    )


ORACLES: dict[str, str] = {}

# the interaction matrix + both cosine directions, shared by both CF
# oracles; ratings are integer centi-units so every dot/norm is exact
_CF_SQL_INTER = f"""inter AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_key,
         CAST(round(sum(value) * 100) AS BIGINT) AS rating
  FROM events
  WHERE event_type IN {CF_EVENT_TYPES!r}
    AND json_extract_string(props, '$.k') IS NOT NULL
  GROUP BY 1, 2
)"""


def _cf_cte(row_key: str, join_key: str, n_neighbors: int) -> str:
    """CTE chain (no WITH, assumes ``inter``): cosine over the
    (row_key × join_key) matrix, top-n neighbors, similarity-normalized
    rating aggregation → ``cand (user_id, doc_key, score)``. Shared by
    the standalone CF oracles and the hybrid blend oracle."""
    if row_key == "user_id":  # user-based: neighbors are users
        cand = """
cand AS (
  SELECT n.ka AS user_id, i.doc_key,
         round(sum(n.sim * i.rating) / sum(n.sim), 9) AS score
  FROM nbrs n JOIN inter i ON i.user_id = n.kb
  WHERE NOT EXISTS (SELECT 1 FROM inter own
                    WHERE own.user_id = n.ka AND own.doc_key = i.doc_key)
  GROUP BY 1, 2
)"""
    else:  # item-based: the user's own items vote for their neighbors
        cand = """
cand AS (
  SELECT i.user_id, n.kb AS doc_key,
         round(sum(n.sim * i.rating) / sum(n.sim), 9) AS score
  FROM inter i JOIN nbrs n ON n.ka = i.doc_key
  WHERE NOT EXISTS (SELECT 1 FROM inter own
                    WHERE own.user_id = i.user_id AND own.doc_key = n.kb)
  GROUP BY 1, 2
)"""
    return f"""r AS (SELECT {row_key} AS rk, {join_key} AS jk, rating FROM inter),
norms AS (SELECT rk, sqrt(CAST(sum(rating * rating) AS DOUBLE)) AS nrm
          FROM r GROUP BY rk),
sims AS (
  SELECT a.rk AS ka, b.rk AS kb,
         CAST(sum(a.rating * b.rating) AS DOUBLE) / (na.nrm * nb.nrm) AS sim
  FROM r a JOIN r b ON a.jk = b.jk AND a.rk <> b.rk
  JOIN norms na ON na.rk = a.rk
  JOIN norms nb ON nb.rk = b.rk
  GROUP BY a.rk, b.rk, na.nrm, nb.nrm
),
nbrs AS (
  SELECT ka, kb, sim FROM (
    SELECT ka, kb, sim,
           row_number() OVER (PARTITION BY ka
                              ORDER BY round(sim, 9) DESC, kb ASC) AS rn
    FROM sims WHERE sim > 0
  ) WHERE rn <= {n_neighbors}
),{cand}"""


def _cf_oracle(row_key: str, join_key: str, n_neighbors: int) -> str:
    return f"""WITH {_CF_SQL_INTER},
{_cf_cte(row_key, join_key, n_neighbors)}
SELECT user_id, CAST(rn AS BIGINT) AS rec_rank, doc_key AS doc_id,
       CAST(round(score * 100000) AS BIGINT) AS score_5dp
FROM (
  SELECT user_id, doc_key, score,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, doc_key ASC) AS rn
  FROM cand
) WHERE rn <= {CF_TOPK}"""


ORACLES["cf_user_recs"] = _cf_oracle("user_id", "doc_key", CF_USER_NEIGHBORS)
ORACLES["cf_item_recs"] = _cf_oracle("doc_key", "user_id", CF_ITEM_NEIGHBORS)


# ------------------------------------------------ A10 hybrid recommender
HY_TOPK = 5
HY_WC, HY_WCF, HY_WPOP = 0.4, 0.4, 0.2


def q_hybrid_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted hybrid fusion (hybrid_recommender.py:166-293): item-CF
    top-3k pool + reading-history content cosines + popularity, per-user
    per-source max normalization, 0.4/0.4/0.2 blend."""
    from .ops.recommend_cf import item_based_recs
    from .ops.recommend_hybrid import (
        content_scores,
        hybrid_weighted,
        item_popularity,
    )
    from .query.vsm import build_tfidf_weights

    inter = _inter(spark, sf_dir)
    cf = item_based_recs(
        inter, n_neighbors=CF_ITEM_NEIGHBORS, k=3 * HY_TOPK
    ).select("user_id", "doc_key", "score")
    content = content_scores(inter, build_tfidf_weights(_index(spark, sf_dir)))
    out = hybrid_weighted(
        cf,
        content,
        item_popularity(inter),
        w_content=HY_WC,
        w_cf=HY_WCF,
        w_pop=HY_WPOP,
        k=HY_TOPK,
    )
    return _recs_out(out)


# shared CTE blocks for the hybrid family (assume _SQL_BASE tf/idf and
# the `inter` CTE are already in scope)
_CONTENT_CTES = """w AS (
  SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
  FROM tf JOIN idf USING (term)
),
wnorms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
wn AS (SELECT w.doc_id, w.term, w.w / wnorms.nrm AS wn
       FROM w JOIN wnorms USING (doc_id)),
cpairs AS (
  SELECT s.doc_id AS seed_id, o.doc_id AS cand_id,
         round(sum(s.wn * o.wn), 9) AS cosine
  FROM wn s JOIN wn o ON o.term = s.term AND o.doc_id <> s.doc_id
  WHERE s.doc_id IN (SELECT DISTINCT doc_key FROM inter)
  GROUP BY 1, 2
),
content AS (
  SELECT i.user_id, p.cand_id AS doc_key, round(avg(p.cosine), 9) AS cs
  FROM inter i JOIN cpairs p ON p.seed_id = i.doc_key
  WHERE NOT EXISTS (SELECT 1 FROM inter own
                    WHERE own.user_id = i.user_id
                      AND own.doc_key = p.cand_id)
  GROUP BY 1, 2
),
pop AS (
  SELECT doc_key,
         CAST(count(DISTINCT user_id) AS DOUBLE) /
           (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) FROM inter)
           AS popularity
  FROM inter GROUP BY doc_key
)"""


def _hybrid_oracle() -> str:
    return f"""{_SQL_BASE},
{_CF_SQL_INTER},
{_cf_cte("doc_key", "user_id", CF_ITEM_NEIGHBORS)},
cfrecs AS (
  SELECT user_id, doc_key, score FROM (
    SELECT user_id, doc_key, score,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY score DESC, doc_key ASC) AS rn
    FROM cand
  ) WHERE rn <= {3 * HY_TOPK}
),
{_CONTENT_CTES},
merged AS (
  SELECT coalesce(c.user_id, f.user_id) AS user_id,
         coalesce(c.doc_key, f.doc_key) AS doc_key,
         coalesce(c.cs, CAST(0 AS DOUBLE)) AS cs,
         coalesce(f.score, CAST(0 AS DOUBLE)) AS fs
  FROM content c FULL OUTER JOIN cfrecs f
    ON f.user_id = c.user_id AND f.doc_key = c.doc_key
),
mx AS (SELECT user_id, max(cs) AS mc, max(fs) AS mf
       FROM merged GROUP BY user_id),
blended AS (
  SELECT m.user_id, m.doc_key,
         round(CAST({HY_WC} AS DOUBLE)
                 * (CASE WHEN x.mc > 0 THEN m.cs / x.mc
                         ELSE CAST(0 AS DOUBLE) END)
             + CAST({HY_WCF} AS DOUBLE)
                 * (CASE WHEN x.mf > 0 THEN m.fs / x.mf
                         ELSE CAST(0 AS DOUBLE) END)
             + CAST({HY_WPOP} AS DOUBLE)
                 * coalesce(p.popularity, CAST(0 AS DOUBLE)), 9) AS score
  FROM merged m JOIN mx x USING (user_id)
  LEFT JOIN pop p USING (doc_key)
)
SELECT user_id, CAST(rn AS BIGINT) AS rec_rank, doc_key AS doc_id,
       CAST(round(score * 100000) AS BIGINT) AS score_5dp
FROM (
  SELECT user_id, doc_key, score,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, doc_key ASC) AS rn
  FROM blended
) WHERE rn <= {HY_TOPK}"""


ORACLES["hybrid_recs"] = _hybrid_oracle()


# --------------------------------- A10 cascade / switching hybrid modes
CAS_POOL = 25  # content recall pool = 5 × top-k (reference top_k * 5)
SW_MIN_INTER = 34  # switches roughly half the sf0.01 users to pure CF


def q_cascade_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade fusion (hybrid_recommender.py:294-390): content recall
    pool re-ranked by the mean item-similarity to the user's items."""
    from .ops.recommend_cf import item_similarities
    from .ops.recommend_hybrid import (
        cascade_recs,
        cf_mean_item_sims,
        content_scores,
        item_popularity,
    )
    from .query.vsm import build_tfidf_weights

    inter = _inter(spark, sf_dir)
    content = content_scores(inter, build_tfidf_weights(_index(spark, sf_dir)))
    cf_mean = cf_mean_item_sims(inter, item_similarities(inter))
    out = cascade_recs(
        content, cf_mean, item_popularity(inter), pool=CAS_POOL, k=HY_TOPK
    )
    return _recs_out(out)


def q_switching_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Switching fusion (hybrid_recommender.py:391-528): experienced
    users get pure item-CF, light users get content re-weighted by
    popularity — one tagged pass, no per-user dispatch."""
    from .ops.recommend_cf import item_based_recs
    from .ops.recommend_hybrid import (
        content_scores,
        item_popularity,
        switching_recs,
    )
    from .query.vsm import build_tfidf_weights

    inter = _inter(spark, sf_dir)
    cf = item_based_recs(
        inter, n_neighbors=CF_ITEM_NEIGHBORS, k=HY_TOPK
    ).select("user_id", "doc_key", "score")
    content = content_scores(inter, build_tfidf_weights(_index(spark, sf_dir)))
    out = switching_recs(
        inter,
        cf,
        content,
        item_popularity(inter),
        min_cf_interactions=SW_MIN_INTER,
        k=HY_TOPK,
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("rec_rank").cast("long").alias("rec_rank"),
        F.col("doc_key").cast("long").alias("doc_id"),
        _e5("score", "score_5dp"),
        "method",
    )


ORACLES["cascade_recs"] = f"""{_SQL_BASE},
{_CF_SQL_INTER},
{_cf_cte("doc_key", "user_id", CF_ITEM_NEIGHBORS)},
{_CONTENT_CTES},
ucount AS (SELECT user_id, count(*) AS n_items FROM inter GROUP BY 1),
msim AS (
  SELECT i.user_id, s.ka AS doc_key, sum(s.sim) AS ssum
  FROM inter i JOIN sims s ON s.kb = i.doc_key
  GROUP BY 1, 2
),
cfm AS (
  SELECT m.user_id, m.doc_key, round(m.ssum / u.n_items, 9) AS cf
  FROM msim m JOIN ucount u USING (user_id)
),
cpool AS (
  SELECT user_id, doc_key, cs FROM (
    SELECT user_id, doc_key, cs,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cs DESC, doc_key ASC) AS pr
    FROM content
  ) WHERE pr <= {CAS_POOL}
),
blended AS (
  SELECT c.user_id, c.doc_key,
         round(CASE WHEN coalesce(f.cf, CAST(0 AS DOUBLE)) > 0
                    THEN CAST(0.7 AS DOUBLE) * f.cf
                       + CAST(0.2 AS DOUBLE) * c.cs
                       + CAST(0.1 AS DOUBLE)
                           * coalesce(p.popularity, CAST(0 AS DOUBLE))
                    ELSE CAST(0.8 AS DOUBLE) * c.cs
                       + CAST(0.2 AS DOUBLE)
                           * coalesce(p.popularity, CAST(0 AS DOUBLE))
               END, 9) AS score
  FROM cpool c
  LEFT JOIN cfm f ON f.user_id = c.user_id AND f.doc_key = c.doc_key
  LEFT JOIN pop p ON p.doc_key = c.doc_key
)
SELECT user_id, CAST(rn AS BIGINT) AS rec_rank, doc_key AS doc_id,
       CAST(round(score * 100000) AS BIGINT) AS score_5dp
FROM (
  SELECT user_id, doc_key, score,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, doc_key ASC) AS rn
  FROM blended
) WHERE rn <= {HY_TOPK}"""

ORACLES["switching_recs"] = f"""{_SQL_BASE},
{_CF_SQL_INTER},
{_cf_cte("doc_key", "user_id", CF_ITEM_NEIGHBORS)},
cfrecs AS (
  SELECT user_id, doc_key, score FROM (
    SELECT user_id, doc_key, score,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY score DESC, doc_key ASC) AS rn
    FROM cand
  ) WHERE rn <= {HY_TOPK}
),
{_CONTENT_CTES},
ucount AS (SELECT user_id, count(*) AS n_inter FROM inter GROUP BY 1),
cfu AS (SELECT user_id FROM ucount WHERE n_inter >= {SW_MIN_INTER}),
branches AS (
  SELECT f.user_id, f.doc_key, round(f.score, 9) AS score,
         'cf' AS method
  FROM cfrecs f WHERE f.user_id IN (SELECT user_id FROM cfu)
  UNION ALL
  SELECT c.user_id, c.doc_key,
         round(CAST(0.7 AS DOUBLE) * c.cs
             + CAST(0.3 AS DOUBLE)
                 * coalesce(p.popularity, CAST(0 AS DOUBLE)), 9),
         'content_pop'
  FROM content c LEFT JOIN pop p ON p.doc_key = c.doc_key
  WHERE c.user_id NOT IN (SELECT user_id FROM cfu)
)
SELECT user_id, CAST(rn AS BIGINT) AS rec_rank, doc_key AS doc_id,
       CAST(round(score * 100000) AS BIGINT) AS score_5dp, method
FROM (
  SELECT user_id, doc_key, score, method,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, doc_key ASC) AS rn
  FROM branches
) WHERE rn <= {HY_TOPK}"""


# --------------------------------------------------- A10 ALS drift gate
ALS_RANK, ALS_ITERS, ALS_REG, ALS_SEED, ALS_BLOCKS = 4, 8, 0.1, 7, 4
ALS_GATE_ITEMS = 5  # pin the factors of the first few items only


def q_als_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.recommend_cf import als_item_factors

    out = als_item_factors(
        _inter(spark, sf_dir),
        rank=ALS_RANK,
        max_iter=ALS_ITERS,
        reg_param=ALS_REG,
        seed=ALS_SEED,
        blocks=ALS_BLOCKS,
    )
    return out.filter(F.col("doc_key") < ALS_GATE_ITEMS).select(
        "doc_key",
        "pos",
        # integer milli-weight: the pinned oracle compares exact longs
        F.round(F.col("weight") * 1000).cast("long").alias("weight_e3"),
    )


# Expected seeded/block-pinned ALS item factors at sf0.01 — emitted by
# scripts/pin_als.py, stable across 3 independent fresh JVMs
# (drift-gate pattern: lda_topics / ltr_train_coefs).
_ALS_EXPECTED: list[tuple[int, int, int]] = [
    (0, 0, 18091),
    (0, 1, 63498),
    (0, 2, 20986),
    (0, 3, -11144),
    (1, 0, 2010),
    (1, 1, 12373),
    (1, 2, 27605),
    (1, 3, -22938),
    (2, 0, -10564),
    (2, 1, 1129),
    (2, 2, 11178),
    (2, 3, -25122),
    (3, 0, -6935),
    (3, 1, 14436),
    (3, 2, -6446),
    (3, 3, -12848),
    (4, 0, -12571),
    (4, 1, 2638),
    (4, 2, -19506),
    (4, 3, -20939),
]


def _als_oracle() -> str:
    rows = ", ".join(f"({d}, {p}, {w})" for d, p, w in _ALS_EXPECTED)
    return (
        "SELECT CAST(doc_key AS BIGINT) AS doc_key,"
        " CAST(pos AS BIGINT) AS pos,"
        " CAST(weight_e3 AS BIGINT) AS weight_e3"
        f" FROM (VALUES {rows}) AS t(doc_key, pos, weight_e3)"
    )


# ------------------------------------------------ search-log analytics
def q_search_log_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.search_log import search_log_digest, search_log_from_events

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return search_log_digest(search_log_from_events(events))


ORACLES["search_log_stats"] = f"""WITH log AS (
  SELECT 'q' || CAST(k % {LOG_QUERY_MOD} AS VARCHAR) AS query,
         event_type AS endpoint, value AS latency,
         CASE WHEN event_type = 'error' THEN 0
              ELSE CAST(k % {LOG_RESULT_MOD} AS INT) END AS result_count
  FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               event_type, value
        FROM events)
)
SELECT 'query' AS metric, query AS key,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN result_count <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(round(round(avg(latency), 9) * 100000) AS BIGINT) AS value_5dp
FROM log GROUP BY query
UNION ALL
SELECT 'endpoint_zero_rate', endpoint,
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN result_count <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(round((CAST(sum(CASE WHEN result_count <= 0 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*)) * 100000) AS BIGINT)
FROM log GROUP BY endpoint
UNION ALL
SELECT 'result_count', CAST(CAST(result_count AS BIGINT) AS VARCHAR),
       CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM log GROUP BY result_count"""


# ---------------------------------------------- cluster→topic labeling
CL_TOP_TERMS = 8


def q_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.cluster import cluster_label_terms, kmeans_assign

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    asn = kmeans_assign(vecs, k=KM_K, n_iters=KM_ITERS)
    idx = _index(spark, sf_dir)
    w = (
        idx.postings.join(idx.term_stats.select("term", "idf"), "term")
        .withColumn("w", (F.lit(1.0) + F.log10("tf")) * F.col("idf"))
        .select("doc_id", "term", "w")
    )
    out = cluster_label_terms(asn, w, top_terms=CL_TOP_TERMS)
    return out.select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("kw_rank").cast("long").alias("kw_rank"),
        "term",
        _e5("cw", "cw_5dp"),
    )


def _cluster_labels_oracle() -> str:
    # lloyd_prefix opens the WITH chain; splice in the shared tf/idf
    # base (strip its leading WITH) and the centroid-label derivation
    base = _SQL_BASE.strip()
    assert base.startswith("WITH ")
    return (
        lloyd_prefix(KM_K, KM_ITERS)
        + f""",
fin AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_cosine_similarity(v.e, c.c), 9) DESC,
                                       c.cluster ASC) AS rk
    FROM v CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
),
"""
        + base[len("WITH ") :]
        + f""",
cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs FROM fin GROUP BY cluster),
cw AS (
  SELECT f.cluster, t.term,
         sum((1 + log10(t.tf)) * i.idf) AS sw
  FROM fin f JOIN tf t ON t.doc_id = f.vec_id
  JOIN idf i USING (term)
  GROUP BY 1, 2
)
SELECT cluster, n_docs, kw_rank, term, cw_5dp FROM (
  SELECT cw.cluster, cs.n_docs, cw.term,
         CAST(row_number() OVER (
           PARTITION BY cw.cluster
           ORDER BY round(cw.sw / cs.n_docs, 9) DESC, cw.term ASC
         ) AS BIGINT) AS kw_rank,
         CAST(round(round(cw.sw / cs.n_docs, 9) * 100000) AS BIGINT) AS cw_5dp
  FROM cw JOIN cs USING (cluster)
) WHERE kw_rank <= {CL_TOP_TERMS}"""
    )


ORACLES["cluster_labels"] = _cluster_labels_oracle()


def registry():
    out = {
        "cf_user_recs": q_cf_user_recs,
        "cf_item_recs": q_cf_item_recs,
        "hybrid_recs": q_hybrid_recs,
        "cascade_recs": q_cascade_recs,
        "switching_recs": q_switching_recs,
        "search_log_stats": q_search_log_stats,
        "cluster_labels": q_cluster_labels,
    }
    if _ALS_EXPECTED:
        out["als_factors"] = q_als_factors
        ORACLES["als_factors"] = _als_oracle()
    return out
