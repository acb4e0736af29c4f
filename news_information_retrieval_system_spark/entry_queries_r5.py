"""Round-4 driver-contract entries.

* contract_violations / normalized_records — S3 record normalize + data
  contract (reference data_contract.py:10-128, document_service.py:111-199):
  the documents table is deterministically degraded into "raw crawler
  records" (planted missing/short titles and contents, colliding
  title+url dedup keys, messy tag strings) and both engines run the full
  validate → dedup-keep-first → normalize pipeline.
* model_overlap — Q27 comparison payload
  (retrieval_orchestrator.py:278-314): pairwise top-k overlap between
  BM25 / TF-IDF / BIM / LM on the shared query set.
* query_suggestions — no-result fallback suggestions
  (search_service.py:750-789): fuzzy + prefix neighbors from the term
  dictionary for out-of-vocabulary query terms.
* json_docs — S1/S2 JSON reader: documents round-tripped through JSONL
  and read back with an explicit schema (spark.read.json).
* simhash_exact_pairs — precision + completeness closure for the SimHash
  LSH pipeline (round-2/3 ADVICE): the full banded+verified pair set,
  computed with md5-based token hashes so DuckDB can recompute the exact
  Hamming-≤h all-pairs set independently. Pigeonhole (16 bands × 4 bits
  covers Hamming ≤ 15) makes pipeline output ≡ exact set — any banding OR
  verify bug now hash-mismatches; the older ``simhash_pairs`` planted-set
  entry gated completeness only.

Both sides of every oracle derive the planted degradations from the SAME
mod-class arithmetic, so the fixtures cannot drift.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries_ops import DUP_EVERY
from .entry_queries import (
    _SQL_BASE,
    _SQL_BM25_SCORED,
    _SQL_TFIDF_SCORED,
    B,
    K1,
    MU,
    TOPK,
    _docs,
    _index,
    _qterms,
)
from .query.bim import score_bim
from .query.bm25 import score_bm25, topk
from .query.lm import score_lm
from .query.vsm import score_tfidf

# ------------------------------------------------------------- S3 fixtures
TITLE_MOD, CONTENT_MOD, URL_MOD = 13, 11, 37
# raw category variants cycling by doc_id: exact alias hit, lowercase
# fallback hit, unmapped, and the empty/unknown bucket (ops/contract.py
# CATEGORY_ALIASES semantics)
RAW_CATEGORIES = ("finance", "TECH", "gadget", "Politics", "bogus", "", "sports")
SUG_TERMS = ["fastt", "scann", "valu", "windoww", "sparc"]
SUG_DIST, SUG_PREFIX, SUG_CAP = 2, 4, 5


def _raw_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic 'raw crawler records' with planted
    contract violations: doc_id%13∈{0,1} breaks the title (missing /
    too short), doc_id%11∈{0,1} breaks the content (missing / truncated
    under MIN_CONTENT_CHARS), url collapses to doc_id%37 classes so
    (title, url) dedup keys collide."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    title = (
        F.when(F.col("doc_id") % TITLE_MOD == 0, F.lit(""))
        .when(F.col("doc_id") % TITLE_MOD == 1, F.lit("x"))
        .otherwise(F.concat_ws(" ", F.slice(toks, 1, 2)))
    )
    content = (
        F.when(F.col("doc_id") % CONTENT_MOD == 0, F.lit(""))
        .when(F.col("doc_id") % CONTENT_MOD == 1, F.substring("text", 1, 10))
        .otherwise(F.col("text"))
    )
    category = F.element_at(
        F.array(*[F.lit(c) for c in RAW_CATEGORIES]),
        (F.col("doc_id") % len(RAW_CATEGORIES)).cast("int") + 1,
    )
    return d.select(
        F.col("doc_id").alias("row_id"),
        title.alias("title"),
        content.alias("content"),
        F.concat(F.lit("https://ex.org/"), (F.col("doc_id") % URL_MOD)).alias("url"),
        F.concat(F.col("source"), F.lit(",misc, ")).alias("tags"),
        category.alias("category"),
    )


_SQL_CAT = "CASE doc_id % " + str(len(RAW_CATEGORIES)) + " " + " ".join(
    f"WHEN {i} THEN '{c}'" for i, c in enumerate(RAW_CATEGORIES)
) + " END"

_SQL_RAW = f"""
raw AS (
  SELECT doc_id AS row_id,
         CASE WHEN doc_id % {TITLE_MOD} = 0 THEN ''
              WHEN doc_id % {TITLE_MOD} = 1 THEN 'x'
              ELSE array_to_string(
                     list_filter(string_split(text, ' '), x -> x <> '')[1:2], ' ')
         END AS title,
         CASE WHEN doc_id % {CONTENT_MOD} = 0 THEN ''
              WHEN doc_id % {CONTENT_MOD} = 1 THEN substr(text, 1, 10)
              ELSE text END AS content,
         'https://ex.org/' || cast(doc_id % {URL_MOD} AS VARCHAR) AS url,
         source || ',misc, ' AS tags,
         {_SQL_CAT} AS category
  FROM documents
),
iss AS (
  SELECT row_id,
         CASE WHEN trim(title) = '' THEN 1 ELSE 0 END AS m_t,
         CASE WHEN trim(content) = '' THEN 1 ELSE 0 END AS m_c,
         CASE WHEN trim(title) <> '' AND length(trim(title)) < 2
              THEN 1 ELSE 0 END AS t_s,
         CASE WHEN trim(content) <> '' AND length(trim(content)) < 20
              THEN 1 ELSE 0 END AS c_s
  FROM raw
),
valid AS (
  SELECT raw.*,
         md5(lower(trim(title)) || '||' || lower(trim(url))) AS h
  FROM raw JOIN iss USING (row_id)
  WHERE m_t + m_c + t_s + c_s = 0
),
dd AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY row_id) AS rn
       FROM valid)
"""


def q_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.contract import normalize_records

    _, rejected = normalize_records(_raw_records(spark, sf_dir))
    return rejected.groupBy("issue").agg(F.count("*").cast("long").alias("n"))


def q_normalized_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.contract import normalize_records

    out, _ = normalize_records(
        _raw_records(spark, sf_dir), category_col="category"
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("row_id").cast("long").alias("row_id"),
        "title",
        F.array_join("tags", "|").alias("tags_joined"),
        "dedup_hash",
        "taxonomy_topic",
        "taxonomy_label",
        "taxonomy_path",
    )


# -------------------------------------------------------- Q27 model compare
RANKCH_TOPN = 50


def _ranked_models(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The four retrieval models' top-k frames on the shared query set —
    the comparison payload inputs (retrieval_orchestrator.py:278-314)."""
    idx = _index(spark, sf_dir)
    q = _qterms(spark)

    def _r(scored):
        return topk(scored.withColumn("score", F.round("score", 9)), k=TOPK)

    return {
        "bm25": _r(score_bm25(idx, q, k1=K1, b=B)),
        "tfidf": _r(score_tfidf(idx, q)),
        "bim": _r(score_bim(idx, q)),
        "lm": _r(score_lm(idx, q, mu=MU)),
    }


def q_model_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.compare import model_overlap

    return model_overlap(_ranked_models(spark, sf_dir)).select(
        "query_id", "model_a", "model_b", F.col("overlap").cast("long")
    )


def q_model_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27 unique-docs block: per (query, model) count of docs only that
    model retrieved, zero-filled."""
    from .query.compare import unique_docs

    return unique_docs(_ranked_models(spark, sf_dir)).select(
        "query_id", "model", F.col("unique_count").cast("long")
    )


def q_model_rank_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27 rank-changes block: per doc ranked by >1 model, the rank span
    across models (max−min), top 50 per query by span desc / doc_id asc."""
    from .query.compare import rank_changes

    return rank_changes(_ranked_models(spark, sf_dir), top_n=RANKCH_TOPN).select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_models").cast("long").alias("n_models"),
        F.col("rank_span").cast("long").alias("rank_span"),
    )


# -------------------------------------------------------- query suggestions
def q_query_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.suggest import query_suggestions

    idx = _index(spark, sf_dir)
    qt = spark.createDataFrame(
        [(f"s{i}", t) for i, t in enumerate(SUG_TERMS)],
        "query_id string, term string",
    )
    out = query_suggestions(
        idx, qt, max_distance=SUG_DIST, prefix_len=SUG_PREFIX, cap=SUG_CAP
    )
    return out.select(
        "query_id",
        "term",
        "kind",
        "suggestion",
        F.col("df").cast("long").alias("df"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------- S1/S2 JSON read
def q_json_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip documents through JSONL and read back with an explicit
    schema (production discipline: no inference scan). Exercises the
    JSON source path end-to-end; result must equal the parquet rows."""
    d = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="nirs_json_")
    d.write.mode("overwrite").json(tmp)
    return (
        spark.read.schema(d.schema)
        .json(tmp)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


def q_json_array_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 JSON-ARRAY reader (vs json_docs' JSONL): one file holding a
    single JSON array of records, read with multiLine=true + explicit
    schema. The array file is fixture scaffolding (driver-side dump of
    the 500 sf0.01 rows); the unit under test is the reader path —
    multiLine JSON cannot be split, so production guidance is JSONL for
    anything large (reference loads whole-file json.load the same way,
    news_loader semantics)."""
    import json
    import os

    d = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="nirs_jsonarr_")
    rows = [r.asDict() for r in d.collect()]
    with open(os.path.join(tmp, "docs.json"), "w") as f:
        json.dump(rows, f)
    return (
        spark.read.schema(d.schema)
        .option("multiLine", "true")
        .json(tmp)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


SIMHASH_HAMMING, SIMHASH_BANDS = 15, 16
IVF_LIST, IVF_PROBE, IVF_ITERS, IVF_TOPK = 8, 3, 3, 20


def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 IVF ANN scale path (complement to the LSH variant): coarse
    k-means quantizer → inverted lists → probe the 3 nearest lists →
    exact cosine re-rank of probed vectors only. The quantizer is fully
    deterministic (seeded ids, round-9 cosine, cluster-asc ties), so the
    oracle reproduces the Lloyd fit, the probe set, AND the re-rank —
    the approximation itself is hash-checked, not just sanity-checked."""
    from .entry_queries_ops import COSINE_QIDS
    from .ops.similarity import ivf_cosine_topk

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_cosine_topk(
        vecs, COSINE_QIDS, k=IVF_TOPK,
        n_list=IVF_LIST, n_probe=IVF_PROBE, n_iters=IVF_ITERS,
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("vec_id")
    )
    return (
        out.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round(F.col("cosine"), 5).alias("cosine_5dp"),
        )
    )


def q_simhash_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 precision closure: ALL pairs the banded SimHash pipeline emits
    (16 four-bit bands, popcount-verified Hamming ≤ 15) over the derived
    dup corpus, with md5-based token hashes (``md5_hash64_col``) so the
    DuckDB oracle recomputes the exact all-pairs Hamming set from scratch.
    Pigeonhole ⇒ the two sets must be identical — this gates precision
    (no garbage pairs) AND completeness (no missed pairs) in one hash."""
    from .entry_queries_ops import _derived_dup_docs
    from .ops.dedup import md5_hash64_col, simhash_candidates

    cand = simhash_candidates(
        _derived_dup_docs(spark, sf_dir),
        hamming=SIMHASH_HAMMING,
        bands=SIMHASH_BANDS,
        hash_fn=md5_hash64_col,
    )
    return cand.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.col("hamming_dist").cast("long").alias("hamming_dist"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

ORACLES["contract_violations"] = f"""
WITH {_SQL_RAW.strip()},
rej AS (
  SELECT row_id, 'MISSING_FIELD:title' AS issue FROM iss WHERE m_t = 1
  UNION ALL
  SELECT row_id, 'MISSING_FIELD:content' FROM iss WHERE m_c = 1
  UNION ALL
  SELECT row_id, 'TITLE_TOO_SHORT' FROM iss WHERE t_s = 1
  UNION ALL
  SELECT row_id, 'CONTENT_TOO_SHORT' FROM iss WHERE c_s = 1
  UNION ALL
  SELECT row_id, 'DUPLICATE' FROM dd WHERE rn > 1
)
SELECT issue, cast(count(*) AS BIGINT) AS n FROM rej GROUP BY issue
"""

def _taxonomy_dims_sql() -> str:
    """VALUES dims generated from the SAME dicts the Spark op broadcasts
    (ops/contract.py CATEGORY_ALIASES / TOPIC_LABELS) — no drift."""
    from .ops.contract import CATEGORY_ALIASES, TOPIC_LABELS

    alias_rows = ", ".join(
        f"('{k}', '{t}', '{l}')" for k, (t, l) in CATEGORY_ALIASES.items()
    )
    label_rows = ", ".join(
        f"('{t}', '{lbl}')" for t, lbl in TOPIC_LABELS.items()
    )
    return (
        f"aliases(alias, topic, leaf) AS (VALUES {alias_rows}),\n"
        f"topic_labels(topic, label) AS (VALUES {label_rows})"
    )


ORACLES["normalized_records"] = f"""
WITH {_SQL_RAW.strip()},
{_taxonomy_dims_sql()},
kept AS (SELECT * FROM dd WHERE rn = 1),
taxo AS (
  SELECT kept.*,
         coalesce(a1.topic, a2.topic, 'other') AS t_topic,
         coalesce(a1.leaf, a2.leaf, 'unknown') AS t_leaf
  FROM kept
  LEFT JOIN aliases a1 ON a1.alias = trim(coalesce(kept.category, ''))
  LEFT JOIN aliases a2 ON a2.alias = lower(trim(coalesce(kept.category, '')))
)
SELECT cast(row_number() OVER (ORDER BY row_id) - 1 AS BIGINT) AS doc_id,
       cast(row_id AS BIGINT) AS row_id,
       trim(title) AS title,
       array_to_string(
         list_filter(list_transform(string_split(tags, ','), x -> trim(x)),
                     x -> x <> ''), '|') AS tags_joined,
       h AS dedup_hash,
       t_topic AS taxonomy_topic,
       coalesce(tl.label, 'Other') AS taxonomy_label,
       'news' || '/' || t_topic || '/' || t_leaf AS taxonomy_path
FROM taxo LEFT JOIN topic_labels tl ON tl.topic = taxo.t_topic
"""

# bim/lm scored CTEs (same formulas the bim_topk / lm_topk oracles pin)
_SQL_BIM_SCORED = """
bscored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln((s.n_docs - idf.df + 0.5) / (idf.df + 0.5))) AS score
  FROM (SELECT DISTINCT query_id, term FROM q) q
  JOIN idf USING (term)
  JOIN tf USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
"""

_SQL_LM_SCORED = f"""
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
tot AS (SELECT cast(sum(dl) AS DOUBLE) AS total_tokens FROM dl),
qcf AS (SELECT q.query_id, q.term, q.qtf, cf.cf / tot.total_tokens AS p_c
        FROM q JOIN cf USING (term) CROSS JOIN tot),
lcand AS (SELECT DISTINCT qcf.query_id, tf.doc_id
          FROM qcf JOIN tf USING (term)),
lscored AS (
  SELECT lcand.query_id, lcand.doc_id,
         sum(qcf.qtf * ln((coalesce(tf.tf, 0) + {MU} * qcf.p_c) / (dl.dl + {MU}))) AS score
  FROM lcand
  JOIN qcf ON qcf.query_id = lcand.query_id
  JOIN dl ON dl.doc_id = lcand.doc_id
  LEFT JOIN tf ON tf.term = qcf.term AND tf.doc_id = lcand.doc_id
  GROUP BY lcand.query_id, lcand.doc_id
)
"""


def _rank_cte(name: str, src: str) -> str:
    return f"""{name} AS (
  SELECT query_id, doc_id, rk FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rk
    FROM {src}) WHERE rk <= {TOPK}
)"""


# shared prefix for the three Q27 comparison payloads: all four models
# ranked (same rounding/tie-break the *_topk oracles pin) and tagged,
# keeping rk for the rank-span stats
_SQL_TAGGED = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
{_SQL_TFIDF_SCORED.lstrip()},
{_SQL_BIM_SCORED.lstrip()},
{_SQL_LM_SCORED.lstrip()},
{_rank_cte("rb", "scored")},
{_rank_cte("rt", "tscored")},
{_rank_cte("ri", "bscored")},
{_rank_cte("rl", "lscored")},
tagged AS (
  SELECT query_id, doc_id, rk, 'bm25' AS model FROM rb
  UNION ALL SELECT query_id, doc_id, rk, 'tfidf' FROM rt
  UNION ALL SELECT query_id, doc_id, rk, 'bim' FROM ri
  UNION ALL SELECT query_id, doc_id, rk, 'lm' FROM rl
)"""

ORACLES["model_overlap"] = f"""{_SQL_TAGGED},
pairs AS (
  SELECT * FROM (VALUES ('bim','bm25'), ('bim','lm'), ('bim','tfidf'),
                        ('bm25','lm'), ('bm25','tfidf'), ('lm','tfidf'))
         p(model_a, model_b)
),
counts AS (
  SELECT a.query_id, a.model AS model_a, b.model AS model_b,
         count(*) AS overlap
  FROM tagged a JOIN tagged b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id AND a.model < b.model
  GROUP BY 1, 2, 3
),
grid AS (
  SELECT q.query_id, p.model_a, p.model_b
  FROM (SELECT DISTINCT query_id FROM tagged) q CROSS JOIN pairs p
)
SELECT g.query_id, g.model_a, g.model_b,
       cast(coalesce(c.overlap, 0) AS BIGINT) AS overlap
FROM grid g LEFT JOIN counts c
  ON c.query_id = g.query_id AND c.model_a = g.model_a AND c.model_b = g.model_b
"""

ORACLES["model_unique_docs"] = f"""{_SQL_TAGGED},
per_doc AS (
  SELECT query_id, doc_id, count(DISTINCT model) AS n_models,
         min(model) AS only_model
  FROM tagged GROUP BY query_id, doc_id
),
ucounts AS (
  SELECT query_id, only_model AS model, count(*) AS unique_count
  FROM per_doc WHERE n_models = 1 GROUP BY query_id, only_model
),
models AS (SELECT * FROM (VALUES ('bim'), ('bm25'), ('lm'), ('tfidf')) m(model)),
ugrid AS (
  SELECT q.query_id, m.model
  FROM (SELECT DISTINCT query_id FROM tagged) q CROSS JOIN models m
)
SELECT g.query_id, g.model,
       cast(coalesce(u.unique_count, 0) AS BIGINT) AS unique_count
FROM ugrid g LEFT JOIN ucounts u
  ON u.query_id = g.query_id AND u.model = g.model
"""

ORACLES["model_rank_changes"] = f"""{_SQL_TAGGED},
spans AS (
  SELECT query_id, doc_id, count(DISTINCT model) AS n_models,
         max(rk) - min(rk) AS rank_span
  FROM tagged GROUP BY query_id, doc_id
  HAVING count(DISTINCT model) > 1
),
ranked_spans AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rank_span DESC, doc_id ASC) AS _rn
  FROM spans
)
SELECT query_id, cast(doc_id AS BIGINT) AS doc_id,
       cast(n_models AS BIGINT) AS n_models,
       cast(rank_span AS BIGINT) AS rank_span
FROM ranked_spans WHERE _rn <= {RANKCH_TOPN}
"""

_SUG_VALUES = ", ".join(
    f"('s{i}', '{t}')" for i, t in enumerate(SUG_TERMS)
)
ORACLES["query_suggestions"] = f"""{_SQL_BASE},
sq(query_id, term) AS (VALUES {_SUG_VALUES}),
missing AS (
  SELECT sq.* FROM sq LEFT JOIN df v ON v.term = sq.term
  WHERE v.term IS NULL
),
cand AS (
  SELECT m.query_id, m.term, v.term AS suggestion, cast(v.df AS BIGINT) AS df
  FROM missing m CROSS JOIN df v
  WHERE v.term <> m.term
),
fz AS (
  SELECT query_id, term, 'fuzzy' AS kind, suggestion, df,
         row_number() OVER (PARTITION BY query_id, term
                            ORDER BY levenshtein(term, suggestion) ASC,
                                     df DESC, suggestion ASC) AS rank
  FROM cand WHERE levenshtein(term, suggestion) <= {SUG_DIST}
),
pf AS (
  SELECT query_id, term, 'prefix' AS kind, suggestion, df,
         row_number() OVER (PARTITION BY query_id, term
                            ORDER BY df DESC, suggestion ASC) AS rank
  FROM cand WHERE starts_with(suggestion, substr(term, 1, {SUG_PREFIX}))
)
SELECT query_id, term, kind, suggestion, df, cast(rank AS BIGINT) AS rank
FROM (SELECT * FROM fz WHERE rank <= {SUG_CAP}
      UNION ALL SELECT * FROM pf WHERE rank <= {SUG_CAP})
"""

HDS_W_LEX, HDS_W_DENSE, HDS_DEPTH = 0.5, 0.5, 50


def q_hybrid_dense_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense+sparse hybrid retrieval (Q21 × A11): RRF-fuse the BM25
    lexical ranking with the exact dense cosine ranking, equal weights.
    Query embeddings are fixture-mapped (query qN ↔ embeddings.vec_id N;
    in production they come from the same encoder as the corpus), and
    embeddings.vec_id indexes the same documents as documents.doc_id.
    Both inner rankings use 9dp-rounded scores (engine summation-order
    safety), matching q_rrf_topk's convention."""
    from .entry_queries import QUERY_SET, RRF_K, _ranked_out
    from .ops.similarity import cosine_topk
    from .query.hybrid import rrf_fuse

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    lex = topk(
        score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)),
        k=HDS_DEPTH,
    )
    qmap = {qid: int(qid[1:]) for qid in QUERY_SET}
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    draw = cosine_topk(vecs, sorted(qmap.values()), k=HDS_DEPTH)
    from pyspark.sql import Window as _W

    wq = _W.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("vec_id")
    )
    mapdf = spark.createDataFrame(
        [(v, k) for k, v in qmap.items()], "qvid long, qid string"
    )
    dense = (
        draw.drop("rank")
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= HDS_DEPTH)
        .join(F.broadcast(mapdf), F.col("query_id") == F.col("qvid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            "rank",
        )
    )
    fused = rrf_fuse(
        [(lex.select("query_id", "doc_id", "rank"), HDS_W_LEX),
         (dense, HDS_W_DENSE)],
        rrf_k=RRF_K,
    )
    return _ranked_out(fused)


def q_pfor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PForDelta posting-list compression report (north-rule
    "varint/PForDelta block compression"; reference ships VByte/Gamma/Delta
    only — compression.py:73-639 — so this is the extension op): per term,
    gap-encode the sorted doc_id list (same totalized first gap = doc_id+1
    as compression_compare) and report the exhaustively-chosen frame width
    b*, exception count, and exact encoded bytes. The Spark side runs the
    REAL encoder (len(pfor_encode(gaps))); the oracle reproduces the byte
    count from the closed-form cost model alone, so any drift between
    encoder and cost model hash-mismatches."""
    import pandas as pd

    from .index.codec import pfor_stats as _pstats

    idx = _index(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d = np.sort(pdf["doc_id"].to_numpy(np.int64))
        s = _pstats(d)
        return pd.DataFrame(
            [(pdf["term"].iloc[0], s["n"], s["b"], s["n_exceptions"],
              s["compressed_size"])],
            columns=["term", "n", "b", "n_exceptions", "pfor_bytes"],
        )

    return (
        idx.postings.select("term", "doc_id")
        .groupBy("term")
        .applyInPandas(
            kernel,
            schema="term string, n long, b long, n_exceptions long, pfor_bytes long",
        )
    )


# Closed-form PForDelta cost in SQL, mirroring pfor_choose_width exactly:
# cost(b) = 1 + varint(n) + varint(n_exc) + ceil(n*b/8)
#         + Σ varint(exception-position deltas) + Σ varint(gap >> b)
# where varint(x) = ceil(bit_length(max(x,1))/7) = ceil(length(bin(x))/7)
# (bin(0)='0' → 1 byte, matching the encoder). The b grid runs past the
# max bit length; those widths cost ≥ cost(max_bl) and lose ties to
# smaller b, so argmin matches the encoder's 0..max_bl scan.
_PFOR_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
post AS (SELECT DISTINCT term, doc_id FROM toks),
g AS (
  SELECT term,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS pos,
         CASE WHEN lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) IS NULL
              THEN doc_id + 1
              ELSE doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
         END AS gap
  FROM post
),
vals AS (SELECT term, pos, gap, length(bin(gap)) AS L FROM g),
tn AS (SELECT term, count(*) AS n FROM vals GROUP BY term),
bs AS (SELECT unnest(generate_series(0, 54)) AS b),
excd AS (
  SELECT term, b, L - b AS hibits,
         pos - coalesce(lag(pos) OVER (PARTITION BY term, b ORDER BY pos), 0)
           AS delta
  FROM (SELECT v.term, bs.b, v.pos, v.L FROM vals v JOIN bs ON v.L > bs.b)
),
eagg AS (
  SELECT term, b, count(*) AS n_exc,
         sum(CAST(ceil(length(bin(delta)) / 7.0) AS BIGINT)) AS pos_bytes,
         sum(CAST(ceil(hibits / 7.0) AS BIGINT)) AS hi_bytes
  FROM excd GROUP BY term, b
),
costs AS (
  SELECT tn.term, tn.n, bs.b,
         coalesce(e.n_exc, 0) AS n_exc,
         1
         + CAST(ceil(length(bin(tn.n)) / 7.0) AS BIGINT)
         + CAST(ceil(length(bin(coalesce(e.n_exc, 0))) / 7.0) AS BIGINT)
         + CAST(ceil(tn.n * bs.b / 8.0) AS BIGINT)
         + coalesce(e.pos_bytes, 0) + coalesce(e.hi_bytes, 0) AS cost
  FROM tn CROSS JOIN bs
  LEFT JOIN eagg e ON e.term = tn.term AND e.b = bs.b
),
best AS (
  SELECT term, n, b, n_exc, cost,
         row_number() OVER (PARTITION BY term ORDER BY cost ASC, b ASC) AS rn
  FROM costs
)
SELECT term, cast(n AS BIGINT) AS n, cast(b AS BIGINT) AS b,
       cast(n_exc AS BIGINT) AS n_exceptions,
       cast(cost AS BIGINT) AS pfor_bytes
FROM best WHERE rn = 1
"""

ORACLES["pfor_stats"] = _PFOR_ORACLE


# IVF ANN: the oracle recomputes the ENTIRE approximate pipeline — Lloyd
# quantizer (shared lloyd_prefix builder), inverted-list assignment, the
# n_probe nearest lists per query, and the exact re-rank of probed
# vectors — so the approximation's candidate set is itself hash-gated.
def _ivf_oracle() -> str:
    from .entry_queries_ops import COSINE_QIDS

    from .entry_queries_r4 import lloyd_prefix

    ids = ", ".join(str(i) for i in COSINE_QIDS)
    return (
        lloyd_prefix(IVF_LIST, IVF_ITERS)
        + f""",
fin AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_cosine_similarity(v.e, c.c), 9) DESC,
                                       c.cluster ASC) AS rk
    FROM v CROSS JOIN c{IVF_ITERS} c
  ) WHERE rk = 1
),
qv AS (SELECT vec_id AS query_id, e AS q FROM v WHERE vec_id IN ({ids})),
probes AS (
  SELECT query_id, cluster FROM (
    SELECT qv.query_id, c.cluster,
           row_number() OVER (PARTITION BY qv.query_id
                              ORDER BY round(list_cosine_similarity(qv.q, c.c), 9) DESC,
                                       c.cluster ASC) AS prk
    FROM qv CROSS JOIN c{IVF_ITERS} c
  ) WHERE prk <= {IVF_PROBE}
),
cand AS (
  SELECT p.query_id, f.vec_id, list_cosine_similarity(qv.q, v.e) AS cos
  FROM probes p
  JOIN fin f USING (cluster)
  JOIN qv ON qv.query_id = p.query_id
  JOIN v ON v.vec_id = f.vec_id
  WHERE f.vec_id <> p.query_id
),
rnk AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos, 9) DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT cast(query_id AS BIGINT) AS query_id, cast(rank AS BIGINT) AS rank,
       cast(vec_id AS BIGINT) AS vec_id, round(cos, 5) AS cosine_5dp
FROM rnk WHERE rank <= {IVF_TOPK}"""
    )


ORACLES["ivf_cosine_topk"] = _ivf_oracle()


def _hds_oracle() -> str:
    from .entry_queries import QUERY_SET, RRF_K

    qmap_vals = ", ".join(f"('{qid}', {int(qid[1:])})" for qid in QUERY_SET)
    return f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
r1 AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored),
qmap(query_id, qvid) AS (VALUES {qmap_vals}),
ev AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
dq AS (SELECT qmap.query_id, qmap.qvid, ev.e AS qe
       FROM qmap JOIN ev ON ev.vec_id = qmap.qvid),
dscored AS (
  SELECT dq.query_id, ev.vec_id AS doc_id,
         round(list_cosine_similarity(dq.qe, ev.e), 9) AS cos
  FROM dq CROSS JOIN ev
  WHERE ev.vec_id <> dq.qvid
),
dr AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, doc_id ASC) AS rank
       FROM dscored),
fused AS (
  SELECT query_id, doc_id, sum(contrib) AS score FROM (
    SELECT query_id, doc_id, {HDS_W_LEX} / ({RRF_K} + rank) AS contrib
    FROM r1 WHERE rank <= {HDS_DEPTH}
    UNION ALL
    SELECT query_id, doc_id, {HDS_W_DENSE} / ({RRF_K} + rank) AS contrib
    FROM dr WHERE rank <= {HDS_DEPTH}
  ) GROUP BY query_id, doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM fused)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}"""


ORACLES["hybrid_dense_sparse_topk"] = _hds_oracle()


# Exact SimHash recomputed from first principles: md5 hex → 8 little-endian
# bytes → 64 bit positions, tf-weighted ±votes per bit, sign → fingerprint
# bit, then brute-force all-pairs Hamming via a per-bit join (550 docs ×
# 64 bits at sf0.01 — trivially exact; the Spark side must reproduce it
# through banding + verification).
ORACLES["simhash_exact_pairs"] = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, cast(floor(n_chars * 0.8) AS INT))
  FROM documents WHERE doc_id % {DUP_EVERY} = 0
),
tt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM docs2),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(l) AS term FROM tt) GROUP BY doc_id, term),
th AS (SELECT DISTINCT term FROM tf),
bits AS (
  SELECT term, j,
         ((((strpos('0123456789abcdef', substr(md5(term), (j // 8) * 2 + 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(term), (j // 8) * 2 + 2, 1)) - 1))
           >> (j % 8)) & 1) AS bit
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
),
votes AS (
  SELECT tf.doc_id, b.j,
         sum(CASE WHEN b.bit = 1 THEN tf.tf ELSE -tf.tf END) AS v
  FROM tf JOIN bits b USING (term)
  GROUP BY tf.doc_id, b.j
),
fp AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS fb FROM votes),
ham AS (
  SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
         sum(CASE WHEN a.fb <> bb.fb THEN 1 ELSE 0 END) AS hd
  FROM fp a JOIN fp bb ON a.j = bb.j AND a.doc_id < bb.doc_id
  GROUP BY a.doc_id, bb.doc_id
)
SELECT cast(doc_a AS BIGINT) AS doc_a, cast(doc_b AS BIGINT) AS doc_b,
       cast(hd AS BIGINT) AS hamming_dist
FROM ham WHERE hd <= {SIMHASH_HAMMING}
"""

ORACLES["json_docs"] = """
SELECT cast(doc_id AS BIGINT) AS doc_id, text, lang, source,
       cast(n_chars AS BIGINT) AS n_chars
FROM documents
"""
ORACLES["json_array_docs"] = ORACLES["json_docs"]


def registry() -> dict:
    return {
        "ef_stats": q_ef_stats,
        "contract_violations": q_contract_violations,
        "normalized_records": q_normalized_records,
        "model_overlap": q_model_overlap,
        "query_suggestions": q_query_suggestions,
        "json_docs": q_json_docs,
        "json_array_docs": q_json_array_docs,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        "hybrid_dense_sparse_topk": q_hybrid_dense_sparse,
        "pfor_stats": q_pfor_stats,
        "simhash_exact_pairs": q_simhash_exact_pairs,
        "model_unique_docs": q_model_unique_docs,
        "model_rank_changes": q_model_rank_changes,
    }


# ------------------------------------------------------------- Elias-Fano
def q_ef_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elias-Fano doc-id-list compression report (the quasi-succinct
    monotone codec modern engines use for sorted posting lists; beyond
    the reference's VByte/Gamma/Delta set — compression.py:73-639). Per
    term the Spark side runs the REAL encoder and reports the payload
    byte length; the oracle reproduces it from the closed-form size
    n*l + (max >> l) + n bits alone (l = bit_length((max+1)//n) - 1),
    so any drift between encoder and size model hash-mismatches."""
    import pandas as pd

    from .index.codec import ef_encode, ef_params

    idx = _index(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d = np.sort(pdf["doc_id"].to_numpy(np.int64))
        data, l = ef_encode(d)
        n, _, _ = ef_params(d)
        return pd.DataFrame(
            [(pdf["term"].iloc[0], n, l, len(data))],
            columns=["term", "n", "l", "ef_bytes"],
        )

    return (
        idx.postings.select("term", "doc_id")
        .groupBy("term")
        .applyInPandas(kernel, schema="term string, n long, l long, ef_bytes long")
    )


ORACLES["ef_stats"] = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
post AS (SELECT DISTINCT term, doc_id FROM toks),
agg AS (SELECT term, count(*) AS n, max(doc_id) AS mx FROM post GROUP BY term),
p AS (
  SELECT term, n, mx,
         length(bin(cast((mx + 1) // n AS BIGINT))) - 1 AS l
  FROM agg
)
SELECT term, cast(n AS BIGINT) AS n, cast(l AS BIGINT) AS l,
       cast((n * l + (mx >> l) + n + 7) // 8 AS BIGINT) AS ef_bytes
FROM p
"""
