"""Round-3 driver-contract entries: cross-model ranking diagnostics (Q28),
general n-gram LM perplexity (A4), full collocation measure set (A5), and
the three-way compression comparison (B11/B12/B13).

Reference parity targets:
* model_compare_terms — ranking_diagnostics_service.py:24-172 (per-term
  contributions across BM25/TF-IDF/LM/BIM for one query/doc pair)
* trigram_lm_ppx — ngram.py:128-467 (add-k trigram LM, perplexity)
* colloc_stats — collocation.py:137-518 (chi-square, t-score)
* compression_compare — compression.py:642-699 (VByte vs Elias Gamma vs
  Elias Delta gap-encoded posting-list sizes vs 4-byte baseline)

Every oracle recomputes its statistic from first principles in DuckDB SQL
over the same parquet rows; 5dp fixed-point export discipline as in
entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import (
    _docs,
    _index,
    _qterms,
    _SQL_BASE,
    _SQL_BM25_SCORED,
    B,
    K1,
    MU,
)
from .query.bm25 import score_bm25, topk

# ----------------------------------------------------------------- fixtures
LM_N = 3  # trigram
LM_ADD_K = 1.0
LM_EVAL_MOD = 17  # eval subset: doc_id % 17 == 0
COLLOC_MIN, COLLOC_TOPN = 5, 20  # same floor as colloc_pmi


def _e5(col: str, alias: str):
    return F.round(F.col(col) * 100000).cast("long").alias(alias)


# ------------------------------------------------- Q28 cross-model matrix
def q_model_compare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term contributions across BM25 / TF-IDF / LM / BIM for each
    query's BM25 top-1 document — the reference's ranking-diagnostics
    matrix, computed by ONE candidate×term expansion instead of a scoring
    pass per model."""
    from .query.diagnostics import model_term_matrix

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    scored = score_bm25(idx, q, k1=K1, b=B).withColumn(
        "score", F.round("score", 9)
    )
    pairs = topk(scored, k=1).select("query_id", "doc_id")
    m = model_term_matrix(idx, q, pairs, k1=K1, b=B, mu=MU)
    return m.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.col("qtf").cast("long").alias("qtf"),
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        _e5("idf", "idf_5dp"),
        _e5("bm25_term", "bm25_5dp"),
        _e5("tfidf_term", "tfidf_5dp"),
        _e5("lm_term", "lm_5dp"),
        _e5("bim_term", "bim_5dp"),
    )


# ------------------------------------------------- A4 trigram LM perplexity
def q_trigram_lm_ppx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-1 trigram LM trained on the full corpus, perplexity of every
    doc_id % {mod} == 0 document (reference ngram.py:259-421 semantics:
    Laplace (c+k)/(c_ctx+kV), ppx = exp(-mean ln p))."""
    from .ops.collocation import ngram_lm_logprob

    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % LM_EVAL_MOD == 0)
    out = ngram_lm_logprob(docs, ev, n=LM_N, add_k=LM_ADD_K)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_grams").cast("long").alias("n_grams"),
        _e5("logprob", "logprob_5dp"),
        _e5("perplexity", "ppx_5dp"),
    )


# ------------------------------------------------- A5 chi-square / t-score
def q_colloc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by chi-square (reference collocation.py:320
    2x2 contingency (O-E)^2/E; t-score :373), same min-count floor as the
    PMI entry — the remaining two measures of the reference's five."""
    from .ops.collocation import collocations

    c = collocations(_docs(spark, sf_dir), min_count=COLLOC_MIN)
    w = Window.orderBy(F.desc(F.round("chi2", 9)), F.asc("w1"), F.asc("w2"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= COLLOC_TOPN)
        .select(
            "w1",
            "w2",
            F.col("n11").cast("long").alias("n11"),
            _e5("chi2", "chi2_5dp"),
            _e5("t_score", "t_5dp"),
        )
    )


# --------------------------------------- B11/B12/B13 compression comparison
# Per-gap sizes as pure JVM column expressions (scale path — no Python in
# the pass over postings); news_information_retrieval_system_spark.index.codec
# implements the actual bit-exact encoders (gamma_encode/delta_encode,
# reference compression.py:260-639) and a pytest pins these formulas to the
# encoders' real output sizes.
_VB_CASE = (
    "CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
    "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 ELSE 5 END"
)


def _gap_size_cols():
    gap = F.col("gap")
    vb = (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < 2097152, 3)
        .when(gap < 268435456, 4)
        .otherwise(5)
    )
    blen = F.length(F.bin("gap"))  # bit_length(gap), gap >= 1
    gamma_bits = 2 * (blen - 1) + 1
    delta_bits = 2 * (F.length(F.bin(blen)) - 1) + 1 + blen - 1
    return vb, gamma_bits, delta_bits


def q_compression_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference compare_compression (compression.py:642-699) over EVERY
    posting list of the index: gap-encode each term's sorted doc_id list
    under VByte / Elias Gamma / Elias Delta, total bytes (bit-codes padded
    to bytes per list, as the reference does) vs the 4-byte-per-int
    baseline. First gap = doc_id[0] + 1 (offset from -1) so dense 0-based
    ids stay encodable — the reference's encode_gaps would reject doc_id
    0; the oracle applies the identical totalization."""
    idx = _index(spark, sf_dir)
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = (
        idx.postings.select("term", "doc_id")
        .withColumn("prev", F.lag("doc_id").over(w))
        .withColumn(
            "gap",
            F.when(F.col("prev").isNull(), F.col("doc_id") + 1).otherwise(
                F.col("doc_id") - F.col("prev")
            ),
        )
    )
    vb, gbits, dbits = _gap_size_cols()
    per_term = gaps.groupBy("term").agg(
        F.count("*").alias("n"),
        F.sum(vb).alias("vbyte_bytes"),
        F.ceil(F.sum(gbits) / 8).alias("gamma_bytes"),
        F.ceil(F.sum(dbits) / 8).alias("delta_bytes"),
    )
    raw = 4.0 * F.col("n_postings")
    return per_term.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("n").cast("long").alias("n_postings"),
        F.sum("vbyte_bytes").cast("long").alias("vbyte_bytes"),
        F.sum("gamma_bytes").cast("long").alias("gamma_bytes"),
        F.sum("delta_bytes").cast("long").alias("delta_bytes"),
    ).select(
        "n_terms",
        "n_postings",
        "vbyte_bytes",
        "gamma_bytes",
        "delta_bytes",
        F.round(F.col("vbyte_bytes") / raw * 100000).cast("long").alias("vbyte_ratio_5dp"),
        F.round(F.col("gamma_bytes") / raw * 100000).cast("long").alias("gamma_ratio_5dp"),
        F.round(F.col("delta_bytes") / raw * 100000).cast("long").alias("delta_ratio_5dp"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

ORACLES["model_compare_terms"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
top1 AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rn
    FROM scored) WHERE rn = 1
),
cf AS (SELECT term, cast(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
tot AS (SELECT cast(sum(dl) AS DOUBLE) AS total_tokens FROM dl),
w AS (SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
      FROM tf JOIN idf USING (term)),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
base AS (
  SELECT t1.query_id, t1.doc_id, q.term, q.qtf,
         coalesce(tf.tf, 0) AS tf, idf.df AS df, idf.idf AS idf, dl.dl AS dl,
         coalesce(w.w / norms.norm, 0.0) AS w_norm,
         cf.cf / tot.total_tokens AS p_c,
         s.n_docs AS n_docs, s.avgdl AS avgdl
  FROM top1 t1
  JOIN q ON q.query_id = t1.query_id
  JOIN idf ON idf.term = q.term
  JOIN cf ON cf.term = q.term
  LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = t1.doc_id
  LEFT JOIN w ON w.term = q.term AND w.doc_id = t1.doc_id
  JOIN norms ON norms.doc_id = t1.doc_id
  JOIN dl ON dl.doc_id = t1.doc_id
  CROSS JOIN tot CROSS JOIN stats s
)
SELECT query_id, cast(doc_id AS BIGINT) AS doc_id, term,
       cast(qtf AS BIGINT) AS qtf, cast(tf AS BIGINT) AS tf,
       cast(df AS BIGINT) AS df,
       cast(round(idf * 100000) AS BIGINT) AS idf_5dp,
       cast(round(qtf * idf * (tf * ({K1} + 1)) /
                  (tf + {K1} * (1 - {B} + {B} * dl / avgdl)) * 100000) AS BIGINT)
         AS bm25_5dp,
       cast(round(qtf * idf * w_norm * 100000) AS BIGINT) AS tfidf_5dp,
       cast(round(qtf * ln((tf + {MU} * p_c) / (dl + {MU})) * 100000) AS BIGINT)
         AS lm_5dp,
       cast(round(CASE WHEN tf > 0
                       THEN ln((n_docs - df + 0.5) / (df + 0.5))
                       ELSE 0.0 END * 100000) AS BIGINT) AS bim_5dp
FROM base
"""

ORACLES["trigram_lm_ppx"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
tg AS (
  SELECT doc_id,
         unnest(tl[1:len(tl)-2]) || ' ' || unnest(tl[2:len(tl)-1]) AS ctx,
         unnest(tl[3:len(tl)]) AS w
  FROM toks WHERE len(tl) >= {LM_N}
),
train AS (SELECT ctx, w, count(*) AS c_ng FROM tg GROUP BY ctx, w),
ctxc AS (SELECT ctx, sum(c_ng) AS c_ctx FROM train GROUP BY ctx),
vocab AS (SELECT cast(count(DISTINCT t.term) AS DOUBLE) AS v
          FROM (SELECT unnest(tl) AS term FROM toks) t),
ev AS (SELECT * FROM tg WHERE doc_id % {LM_EVAL_MOD} = 0),
scored AS (
  SELECT ev.doc_id,
         ln((coalesce(train.c_ng, 0) + {LM_ADD_K}) /
            (coalesce(ctxc.c_ctx, 0) + {LM_ADD_K} * vocab.v)) AS logp
  FROM ev
  LEFT JOIN train ON train.ctx = ev.ctx AND train.w = ev.w
  LEFT JOIN ctxc ON ctxc.ctx = ev.ctx
  CROSS JOIN vocab
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(count(*) AS BIGINT) AS n_grams,
       cast(round(sum(logp) * 100000) AS BIGINT) AS logprob_5dp,
       cast(round(exp(-sum(logp) / count(*)) * 100000) AS BIGINT) AS ppx_5dp
FROM scored GROUP BY doc_id
"""

ORACLES["colloc_stats"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(tl[1:len(tl)-1]) AS w1, unnest(tl[2:len(tl)]) AS w2
  FROM toks WHERE len(tl) >= 2
),
n11 AS (SELECT w1, w2, count(*) AS n11 FROM bg GROUP BY w1, w2),
tot AS (SELECT cast(count(*) AS DOUBLE) AS n FROM bg),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY w2),
j AS (
  SELECT n11.w1, n11.w2, n11.n11, c1.c1, c2.c2, tot.n
  FROM n11 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot
  WHERE n11.n11 >= {COLLOC_MIN}
),
m AS (
  SELECT w1, w2, n11,
         (CASE WHEN c1 * c2 / n > 0
               THEN pow(n11 - c1 * c2 / n, 2) / (c1 * c2 / n) ELSE 0 END
        + CASE WHEN c1 * (n - c2) / n > 0
               THEN pow((c1 - n11) - c1 * (n - c2) / n, 2) / (c1 * (n - c2) / n) ELSE 0 END
        + CASE WHEN (n - c1) * c2 / n > 0
               THEN pow((c2 - n11) - (n - c1) * c2 / n, 2) / ((n - c1) * c2 / n) ELSE 0 END
        + CASE WHEN (n - c1) * (n - c2) / n > 0
               THEN pow((n - c1 - c2 + n11) - (n - c1) * (n - c2) / n, 2)
                    / ((n - c1) * (n - c2) / n) ELSE 0 END) AS chi2,
         (n11 / n - (c1 / n) * (c2 / n)) / sqrt((n11 / n) / n) AS t_score
  FROM j
),
rk AS (SELECT *, row_number() OVER (ORDER BY round(chi2, 9) DESC, w1 ASC, w2 ASC) AS rk
       FROM m)
SELECT w1, w2, cast(n11 AS BIGINT) AS n11,
       cast(round(chi2 * 100000) AS BIGINT) AS chi2_5dp,
       cast(round(t_score * 100000) AS BIGINT) AS t_5dp
FROM rk WHERE rk <= {COLLOC_TOPN}
"""

ORACLES["compression_compare"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
post AS (SELECT DISTINCT term, doc_id FROM toks),
g AS (
  SELECT term,
         CASE WHEN lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) IS NULL
              THEN doc_id + 1
              ELSE doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
         END AS gap
  FROM post
),
sz AS (
  SELECT term, gap,
         {_VB_CASE} AS vb,
         2 * (length(bin(gap)) - 1) + 1 AS gbits,
         2 * (length(bin(length(bin(gap)))) - 1) + 1 + length(bin(gap)) - 1 AS dbits
  FROM g
),
per_term AS (
  SELECT term, count(*) AS n, sum(vb) AS vbyte_bytes,
         ceil(sum(gbits) / 8.0) AS gamma_bytes,
         ceil(sum(dbits) / 8.0) AS delta_bytes
  FROM sz GROUP BY term
)
SELECT cast(count(*) AS BIGINT) AS n_terms,
       cast(sum(n) AS BIGINT) AS n_postings,
       cast(sum(vbyte_bytes) AS BIGINT) AS vbyte_bytes,
       cast(sum(gamma_bytes) AS BIGINT) AS gamma_bytes,
       cast(sum(delta_bytes) AS BIGINT) AS delta_bytes,
       cast(round(sum(vbyte_bytes) / (4.0 * sum(n)) * 100000) AS BIGINT) AS vbyte_ratio_5dp,
       cast(round(sum(gamma_bytes) / (4.0 * sum(n)) * 100000) AS BIGINT) AS gamma_ratio_5dp,
       cast(round(sum(delta_bytes) / (4.0 * sum(n)) * 100000) AS BIGINT) AS delta_ratio_5dp
FROM per_term
"""


def registry() -> dict:
    return {
        "model_compare_terms": q_model_compare_terms,
        "trigram_lm_ppx": q_trigram_lm_ppx,
        "colloc_stats": q_colloc_stats,
        "compression_compare": q_compression_compare,
    }
