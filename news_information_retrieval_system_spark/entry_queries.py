"""Driver-contract query registry: Spark implementations + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here as a (queries(),
oracle_sql()) pair over the driver testdata tables (documents, events,
embeddings, ...). Constants (query sets, probe terms) are embedded into the
SQL via f-strings from the SAME Python values the Spark side uses, so the
two can't drift.

Output discipline (driver hashes values with columns sorted by name):
* every aggregate/computed column aliased identically on both sides
* floating scores exported as ``*_5dp`` = CAST(round(x*1e5) AS BIGINT) —
  integer-exact across engines; ranking itself uses the exact double
* ints exported as BIGINT on both sides
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index.build import FulltextIndex, build_index, build_positional
from .query.bim import score_bim
from .query.bm25 import score_bm25, topk
from .query.hybrid import ranked, rrf_fuse
from .query.lm import score_lm
from .query.vsm import score_tfidf
from .tokenize import py_tokenize, tokens_col

# ----------------------------------------------------------------- fixtures
QUERY_SET = {
    "q1": "fast table scan",
    "q2": "spark join",
    "q3": "window agg batch",
    "q4": "slow value",
    "q5": "customer order line",
}
PROBE_TERMS = ["fast", "scan", "spark", "value", "window"]
TOPK = 10
K1, B = 1.2, 0.75
MU = 2000.0
RRF_K, W_BM25, W_TFIDF, RRF_DEPTH = 60, 0.65, 0.35, 50

_INDEX_CACHE: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str) -> FulltextIndex:
    key = (id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        idx = build_index(_docs(spark, sf_dir))
        idx.persist()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _qterms(spark: SparkSession) -> DataFrame:
    rows = []
    for qid, text in QUERY_SET.items():
        for term, qtf in sorted(Counter(py_tokenize(text)).items()):
            rows.append((qid, term, qtf))
    return spark.createDataFrame(rows, "query_id string, term string, qtf int")


def _qterms_values_sql() -> str:
    rows = []
    for qid, text in QUERY_SET.items():
        for term, qtf in sorted(Counter(py_tokenize(text)).items()):
            rows.append(f"('{qid}', '{term}', {qtf})")
    return "q(query_id, term, qtf) AS (VALUES " + ", ".join(rows) + ")"


def _e5(col: str = "score"):
    return F.round(F.col(col) * 100000).cast("long").alias("score_5dp")


# Shared DuckDB CTE prefix: tokenization + tf/dl/stats/idf, exactly the
# engine's build semantics (documents.text is [a-z0-9 ] so whitespace
# split == the \w+ tokenizer).
_SQL_BASE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id,
              len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
       FROM documents),
stats AS (SELECT cast(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, cast(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (SELECT term, df, ln(1 + (s.n_docs - df + 0.5)/(df + 0.5)) AS idf
        FROM df CROSS JOIN stats s),
{_qterms_values_sql()}
"""

_SQL_BM25_SCORED = f"""
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * idf.idf *
             (tf.tf * ({K1} + 1)) /
             (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))) AS score
  FROM q
  JOIN idf USING (term)
  JOIN tf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
"""

_SQL_TFIDF_SCORED = """
w AS (
  SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
  FROM tf JOIN idf USING (term)
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
tscored AS (
  SELECT q.query_id, w.doc_id,
         sum(q.qtf * idf.idf * w.w / norms.norm) AS score
  FROM q
  JOIN idf USING (term)
  JOIN w ON w.term = q.term
  JOIN norms ON norms.doc_id = w.doc_id
  GROUP BY q.query_id, w.doc_id
  HAVING sum(q.qtf * idf.idf * w.w / norms.norm) > 0
)
"""


# ----------------------------------------------------------------- queries
def q_tok_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def q_term_df_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return (
        idx.term_stats.select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


def q_postings_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.postings.filter(F.col("term").isin(PROBE_TERMS)).select(
        "term",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    vocab = idx.term_stats.agg(
        F.count("*").alias("vocab_size"), F.sum("df").alias("total_postings")
    )
    return (
        idx.stats.join(vocab, how="cross")
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("avgdl") * 100000).cast("long").alias("avgdl_5dp"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.col("total_postings").cast("long").alias("total_postings"),
        )
    )


def _ranked_out(scored: DataFrame, k: int = TOPK) -> DataFrame:
    # rank on 9dp-rounded scores everywhere: the DuckDB oracle may compute
    # sums in a different order, and exact-score ranking would flip
    # ulp-level near-ties across engines
    scored = scored.withColumn("_exact", F.col("score")).withColumn(
        "score", F.round("score", 9)
    )
    return topk(scored, k=k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5(),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked_out(score_bm25(_index(spark, sf_dir), _qterms(spark), k1=K1, b=B))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked_out(score_tfidf(_index(spark, sf_dir), _qterms(spark)))


def q_bim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked_out(score_bim(_index(spark, sf_dir), _qterms(spark)))


def q_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked_out(score_lm(_index(spark, sf_dir), _qterms(spark), mu=MU))


def q_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    # inner ranks use scores rounded to 9dp: deep-tail scores can differ by
    # ~1 ulp between engines (summation order), which would flip adjacent
    # ranks and amplify through the fusion
    r1 = topk(score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)), k=RRF_DEPTH)
    r2 = topk(score_tfidf(idx, q).withColumn("score", F.round("score", 9)), k=RRF_DEPTH)
    fused = rrf_fuse([(r1, W_BM25), (r2, W_TFIDF)], rrf_k=RRF_K)
    return _ranked_out(fused)


def q_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND over the compressed block index — must be
    rank-identical to q_bm25_topk (shares its oracle SQL)."""
    from .index.segments import build_blocked_postings
    from .query.wand import wand_topk

    idx = _index(spark, sf_dir)
    n_docs, avgdl = idx.scalar_stats()
    key = ("blocks", id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_blocked_postings(idx.postings).persist()
    blocks = _INDEX_CACHE[key]
    qidf = _qterms(spark).join(idx.term_stats.select("term", "idf"), "term")
    # k+5 then re-rank on 9dp-rounded scores: WAND accumulates per-doc sums
    # in a different order than the flat path, so near-ties can flip by one
    # ulp across engines
    out = wand_topk(blocks, qidf, n_docs, avgdl, k=TOPK + 5, k1=K1, b=B)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("doc_id")
    )
    return (
        out.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            _e5(),
        )
    )


ORACLES: dict[str, str] = {}

ORACLES["tok_counts"] = f"""{_SQL_BASE}
SELECT cast(doc_id AS BIGINT) AS doc_id, cast(dl AS BIGINT) AS n_tokens
FROM dl ORDER BY doc_id
"""

ORACLES["term_df_top50"] = f"""{_SQL_BASE}
SELECT term, cast(df AS BIGINT) AS df FROM df
ORDER BY df DESC, term ASC LIMIT 50
"""

_probe_list = ", ".join(f"'{t}'" for t in PROBE_TERMS)
ORACLES["postings_probe"] = f"""{_SQL_BASE}
SELECT tf.term, cast(tf.doc_id AS BIGINT) AS doc_id,
       cast(tf.tf AS BIGINT) AS tf, cast(dl.dl AS BIGINT) AS dl
FROM tf JOIN dl ON tf.doc_id = dl.doc_id
WHERE tf.term IN ({_probe_list})
"""

ORACLES["corpus_stats"] = f"""{_SQL_BASE}
SELECT cast(s.n_docs AS BIGINT) AS n_docs,
       cast(round(s.avgdl * 100000) AS BIGINT) AS avgdl_5dp,
       (SELECT cast(count(*) AS BIGINT) FROM df) AS vocab_size,
       (SELECT cast(sum(df) AS BIGINT) FROM df) AS total_postings
FROM stats s
"""

ORACLES["bm25_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["tfidf_topk"] = f"""{_SQL_BASE},
{_SQL_TFIDF_SCORED},
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM tscored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["bim_topk"] = f"""{_SQL_BASE},
bscored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln((s.n_docs - idf.df + 0.5) / (idf.df + 0.5))) AS score
  FROM (SELECT DISTINCT query_id, term FROM q) q
  JOIN idf USING (term)
  JOIN tf USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM bscored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["lm_topk"] = f"""{_SQL_BASE},
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
tot AS (SELECT cast(sum(dl) AS DOUBLE) AS total_tokens FROM dl),
qcf AS (SELECT q.query_id, q.term, q.qtf, cf.cf / tot.total_tokens AS p_c
        FROM q JOIN cf USING (term) CROSS JOIN tot),
cand AS (SELECT DISTINCT qcf.query_id, tf.doc_id
         FROM qcf JOIN tf USING (term)),
lscored AS (
  SELECT cand.query_id, cand.doc_id,
         sum(qcf.qtf * ln((coalesce(tf.tf, 0) + {MU} * qcf.p_c) / (dl.dl + {MU}))) AS score
  FROM cand
  JOIN qcf ON qcf.query_id = cand.query_id
  JOIN dl ON dl.doc_id = cand.doc_id
  LEFT JOIN tf ON tf.term = qcf.term AND tf.doc_id = cand.doc_id
  GROUP BY cand.query_id, cand.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM lscored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["rrf_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
{_SQL_TFIDF_SCORED.lstrip()},
r1 AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored),
r2 AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM tscored),
fused AS (
  SELECT query_id, doc_id, sum(contrib) AS score FROM (
    SELECT query_id, doc_id, {W_BM25} / ({RRF_K} + rank) AS contrib
    FROM r1 WHERE rank <= {RRF_DEPTH}
    UNION ALL
    SELECT query_id, doc_id, {W_TFIDF} / ({RRF_K} + rank) AS contrib
    FROM r2 WHERE rank <= {RRF_DEPTH}
  ) GROUP BY query_id, doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM fused)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""


ORACLES["wand_topk"] = ORACLES["bm25_topk"]


def registry() -> dict:
    return {
        "tok_counts": q_tok_counts,
        "term_df_top50": q_term_df_top50,
        "postings_probe": q_postings_probe,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25_topk,
        "tfidf_topk": q_tfidf_topk,
        "bim_topk": q_bim_topk,
        "lm_topk": q_lm_topk,
        "rrf_topk": q_rrf_topk,
        "wand_topk": q_wand_topk,
    }
