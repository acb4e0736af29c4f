"""Driver-contract entries for the learning-to-rank sandbox (A12).

* ltr_features — learning_to_rank_feature_service.py:140-197 feature rows
  over each query's BM25 top-k impressions (the reference's
  _rows_from_search_event expansion), weak label = deterministic click
  surrogate (all query terms present). Oracle recomputes every feature —
  candidates, match counts, bm25/tfidf/lm sums, label — from first
  principles in DuckDB.
* ltr_train_coefs — learning_to_rank_training_service.py:38-122
  standardized balanced logistic regression on those rows. Iterative
  L-BFGS optimization is not SQL-derivable, so the oracle is a
  DETERMINISM DRIFT-GATE: the pinned VALUES are the seeded training
  output, verified identical across three fresh JVMs AND across
  local[8]/local[32] (the float-summation-order probe). The pytest
  suite additionally pins determinism, class handling, and coefficient
  sanity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import (
    _SQL_BASE,
    _SQL_BM25_SCORED,
    _index,
    _qterms,
    B,
    K1,
    MU,
)

LTR_K_CAND = 10  # impressions per query (reference top_results expansion)
# click surrogate: every query term appears >= this many times. 4 keeps
# both weak-label classes populated at sf0.01 (measured 20 pos / 30 neg)
# where "all terms present" is satisfied by every top-10 candidate.
LTR_CLICK_TF = 4


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.ltr import ltr_features

    out = ltr_features(
        _index(spark, sf_dir), _qterms(spark), k_cand=LTR_K_CAND,
        click_tf=LTR_CLICK_TF, k1=K1, b=B, mu=MU,
    )
    e5 = lambda c, a: F.round(F.col(c) * 100000).cast("long").alias(a)  # noqa: E731
    return out.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("label").cast("long").alias("label"),
        F.col("query_term_count").cast("long").alias("query_term_count"),
        F.col("match_count").cast("long").alias("match_count"),
        F.col("dl").cast("long").alias("dl"),
        e5("bm25_score", "bm25_5dp"),
        e5("tfidf_score", "tfidf_5dp"),
        e5("lm_score", "lm_5dp"),
    )


def q_ltr_train_coefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.ltr import ltr_features, ltr_train

    feats = ltr_features(
        _index(spark, sf_dir), _qterms(spark), k_cand=LTR_K_CAND,
        click_tf=LTR_CLICK_TF, k1=K1, b=B, mu=MU,
    )
    coefs, _report = ltr_train(feats)
    return coefs.orderBy("feature").select(
        "feature",
        # integer micro-coefficient (×1e6): the pinned oracle compares
        # exact longs, never float-literal parses
        F.round(F.col("coefficient") * 1000000).cast("long").alias("coef_e6"),
        "direction",
    )


ORACLES: dict[str, str] = {}

# ltr_train_coefs: expected standardized balanced-LR output at sf0.01.
# L-BFGS is not SQL-derivable, so this is a determinism DRIFT-GATE (same
# framing as lda_topics): pin verified identical across three fresh JVMs
# and across local[8]/local[32]; any change to the feature expansion,
# standardization, or class weighting fails the hash.
_LTR_COEF_EXPECTED = [
    ("__intercept__", -460895, "negative"),
    ("bm25_score", 1819447, "positive"),
    ("dl", 1834342, "positive"),
    ("lm_score", 712720, "positive"),
    ("match_count", -658535, "negative"),
    ("query_term_count", -658535, "negative"),
    ("tfidf_score", -804750, "negative"),
]
ORACLES["ltr_train_coefs"] = (
    "SELECT feature, cast(coef_e6 AS BIGINT) AS coef_e6, direction\n"
    "FROM (VALUES "
    + ", ".join(f"('{f}', {c}, '{d}')" for f, c, d in _LTR_COEF_EXPECTED)
    + ") AS t(feature, coef_e6, direction)"
)

ORACLES["ltr_features"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
cand AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC)
             AS rank
    FROM scored) WHERE rank <= {LTR_K_CAND}
),
cf AS (SELECT term, cast(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
tot AS (SELECT cast(sum(dl) AS DOUBLE) AS total_tokens FROM dl),
w AS (SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
      FROM tf JOIN idf USING (term)),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
base AS (
  SELECT c.query_id, c.doc_id, c.rank, q.term, q.qtf,
         coalesce(tf.tf, 0) AS tf, idf.idf AS idf, dl.dl AS dl,
         coalesce(w.w / norms.norm, 0.0) AS w_norm,
         cf.cf / tot.total_tokens AS p_c, s.avgdl AS avgdl
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN idf ON idf.term = q.term
  JOIN cf ON cf.term = q.term
  LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = c.doc_id
  LEFT JOIN w ON w.term = q.term AND w.doc_id = c.doc_id
  JOIN norms ON norms.doc_id = c.doc_id
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN tot CROSS JOIN stats s
),
agg AS (
  SELECT query_id, doc_id, max(rank) AS rank,
         sum(qtf) AS qtc,
         count(CASE WHEN tf > 0 THEN 1 END) AS match_count,
         min(tf) AS min_tf, max(dl) AS dl,
         sum(qtf * idf * (tf * ({K1} + 1)) /
             (tf + {K1} * (1 - {B} + {B} * dl / avgdl))) AS bm25,
         sum(qtf * idf * w_norm) AS tfidf,
         sum(qtf * ln((tf + {MU} * p_c) / (dl + {MU}))) AS lm
  FROM base GROUP BY query_id, doc_id
)
SELECT query_id, cast(doc_id AS BIGINT) AS doc_id,
       cast(rank AS BIGINT) AS rank,
       cast(CASE WHEN min_tf >= {LTR_CLICK_TF} THEN 1 ELSE 0 END AS BIGINT)
         AS label,
       cast(qtc AS BIGINT) AS query_term_count,
       cast(match_count AS BIGINT) AS match_count,
       cast(dl AS BIGINT) AS dl,
       cast(round(bm25 * 100000) AS BIGINT) AS bm25_5dp,
       cast(round(tfidf * 100000) AS BIGINT) AS tfidf_5dp,
       cast(round(lm * 100000) AS BIGINT) AS lm_5dp
FROM agg
"""


def registry():
    return {
        "ltr_features": q_ltr_features,
        "ltr_train_coefs": q_ltr_train_coefs,
    }
