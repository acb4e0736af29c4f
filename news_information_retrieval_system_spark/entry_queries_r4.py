"""Round-4 driver-contract entries: keyword extraction (A8 RAKE /
TextRank), deterministic k-means document clustering (A6), and
content-based related-document recommendation (A10).

Reference parity targets:
* rake_top — rake_extractor.py:84-299 (degree/frequency keyphrases)
* textrank_top — textrank.py:347-481 (stopword-filtered co-occurrence
  graph, weighted PageRank; the use_position_weight=False path)
* kmeans_clusters — doc_cluster.py:451-598 (Lloyd iterations, cosine
  assignment; deterministic init/iteration discipline documented in
  ops/cluster.py)
* related_docs — content_based.py:63-340 (TF-IDF cosine top-k)

Every oracle recomputes the statistic from first principles in DuckDB
SQL over the same parquet rows. The two iterative algorithms snap their
state to a 9-decimal grid every iteration in BOTH engines (see
ops/keywords.py / ops/cluster.py), which makes the fixed-point export
comparison exact despite independent float summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs, _index, _SQL_BASE

# ----------------------------------------------------------------- fixtures
RAKE_TOPK, RAKE_MAXLEN = 3, 4
TR_WINDOW, TR_DAMPING, TR_ITERS, TR_TOPK, TR_MOD = 5, 0.85, 10, 5, 17
KM_K, KM_ITERS = 8, 5
REC_MOD, REC_TOPN = 29, 5
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")
_STOPLIST_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def _e5(col: str, alias: str):
    return F.round(F.col(col) * 100000).cast("long").alias(alias)


# --------------------------------------------------------------- A8 RAKE
def q_rake_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.keywords import rake_keywords

    out = rake_keywords(
        _docs(spark, sf_dir),
        stopwords=STOPWORDS,
        max_phrase_len=RAKE_MAXLEN,
        top_k=RAKE_TOPK,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "phrase",
        F.col("n_words").cast("long").alias("n_words"),
        _e5("score", "score_5dp"),
    )


# ----------------------------------------------------------- A8 TextRank
def q_textrank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.keywords import textrank_keywords

    ev = _docs(spark, sf_dir).filter(F.col("doc_id") % TR_MOD == 0)
    out = textrank_keywords(
        ev,
        stopwords=STOPWORDS,
        window=TR_WINDOW,
        damping=TR_DAMPING,
        n_iters=TR_ITERS,
        top_k=TR_TOPK,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        _e5("pr", "pr_5dp"),
    )


# ------------------------------------------------------------ A6 k-means
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.cluster import kmeans_assign

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_assign(vecs, k=KM_K, n_iters=KM_ITERS)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
    )


# -------------------------------------------------------- A10 related docs
def q_related_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.recommend import related_docs

    idx = _index(spark, sf_dir)
    seeds = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % REC_MOD == 0)
        .select("doc_id")
    )
    out = related_docs(idx, seeds, topn=REC_TOPN)
    return out.select(
        F.col("seed_id").cast("long").alias("seed_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5("cosine", "cosine_5dp"),
        F.col("rec_rank").cast("long").alias("rec_rank"),
    )


# ------------------------------------------------------- A9 key sentences
SUM_K, SUM_CHUNK = 3, 12


def q_key_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF key-sentence extractive summary (static.py:335-411). The
    synthetic corpus has no sentence terminators, so the entry first
    injects one deterministically after every {SUM_CHUNK} tokens — BOTH
    engines derive the same punctuated text, then run their own full
    pipelines (the Spark side exercises the real regex-segmentation
    path on the rebuilt string)."""
    from .ops.summarize import key_sentences

    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    n_chunks = F.ceil(F.size(toks) / F.lit(SUM_CHUNK)).cast("int")
    text2 = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * SUM_CHUNK + 1, SUM_CHUNK), " "
            ),
        ),
        ". ",
    )
    punct = docs.select("doc_id", text2.alias("text")).filter(
        F.col("text") != ""
    )
    out = key_sentences(punct, k=SUM_K, position_bias=True)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("position").cast("long").alias("position"),
        "sentence",
        _e5("score", "score_5dp"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

ORACLES["rake_top"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
t AS (SELECT doc_id, unnest(tl) AS term, generate_subscripts(tl, 1) AS pos FROM toks),
m AS (SELECT doc_id, term, pos, term IN ({_STOPLIST_SQL}) AS stop FROM t),
p AS (SELECT *, sum(CASE WHEN stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id FROM m),
cand AS (SELECT * FROM p WHERE NOT stop),
phrases AS (
  SELECT doc_id, phrase_id, string_agg(term, ' ' ORDER BY pos) AS phrase,
         count(*) AS n_words
  FROM cand GROUP BY doc_id, phrase_id HAVING count(*) <= {RAKE_MAXLEN}
),
words AS (SELECT doc_id, phrase_id, n_words,
                 unnest(string_split(phrase, ' ')) AS term FROM phrases),
ws AS (SELECT doc_id, term, count(*) AS freq, sum(n_words) AS deg
       FROM words GROUP BY doc_id, term),
sc AS (SELECT w.doc_id, w.phrase_id, sum(ws.deg * 1.0 / ws.freq) AS score
       FROM words w JOIN ws USING (doc_id, term) GROUP BY w.doc_id, w.phrase_id),
rk AS (
  SELECT ph.doc_id, ph.phrase, ph.n_words, sc.score,
         row_number() OVER (PARTITION BY ph.doc_id
                            ORDER BY round(sc.score, 9) DESC, ph.phrase ASC) AS rk
  FROM phrases ph JOIN sc USING (doc_id, phrase_id)
)
SELECT cast(doc_id AS BIGINT) AS doc_id, phrase,
       cast(n_words AS BIGINT) AS n_words,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rk <= {RAKE_TOPK}
"""


def _textrank_oracle() -> str:
    d, n_iters = TR_DAMPING, TR_ITERS
    parts = [
        f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents WHERE doc_id % {TR_MOD} = 0
),
t0 AS (SELECT doc_id, unnest(tl) AS term, generate_subscripts(tl, 1) AS pos FROM toks),
filt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS fpos
  FROM t0 WHERE term NOT IN ({_STOPLIST_SQL})
),
e0 AS (
  SELECT a.doc_id, a.term AS src, b.term AS dst
  FROM filt a JOIN filt b
    ON a.doc_id = b.doc_id AND b.fpos > a.fpos
   AND b.fpos < a.fpos + {TR_WINDOW} AND a.term <> b.term
),
edges AS MATERIALIZED (
  SELECT doc_id, src, dst, cast(count(*) AS DOUBLE) AS w FROM (
    SELECT doc_id, src, dst FROM e0
    UNION ALL SELECT doc_id, dst AS src, src AS dst FROM e0
  ) GROUP BY doc_id, src, dst
),
wdeg AS MATERIALIZED (SELECT doc_id, src AS term, sum(w) AS wsum FROM edges GROUP BY doc_id, src),
nodes AS (SELECT DISTINCT doc_id, term FROM filt),
nn AS (SELECT doc_id, cast(count(*) AS DOUBLE) AS n FROM nodes GROUP BY doc_id),
pr0 AS MATERIALIZED (SELECT nodes.doc_id, nodes.term, round(1.0 / nn.n, 9) AS pr
        FROM nodes JOIN nn USING (doc_id))"""
    ]
    for i in range(1, n_iters + 1):
        p = f"pr{i - 1}"
        parts.append(
            f""",
flow{i} AS MATERIALIZED (
  SELECT e.doc_id, e.dst AS term, sum(p.pr * e.w / wd.wsum) AS f
  FROM edges e
  JOIN {p} p ON p.doc_id = e.doc_id AND p.term = e.src
  JOIN wdeg wd ON wd.doc_id = e.doc_id AND wd.term = e.src
  GROUP BY e.doc_id, e.dst
),
dang{i} AS MATERIALIZED (
  SELECT p.doc_id,
         coalesce(sum(CASE WHEN wd.term IS NULL THEN p.pr END), 0) AS ds
  FROM {p} p LEFT JOIN wdeg wd ON wd.doc_id = p.doc_id AND wd.term = p.term
  GROUP BY p.doc_id
),
pr{i} AS MATERIALIZED (
  SELECT n.doc_id, n.term,
         round((1 - {d}) / nn.n + {d} * (coalesce(f.f, 0) + dg.ds / nn.n), 9) AS pr
  FROM nodes n
  JOIN nn USING (doc_id)
  LEFT JOIN flow{i} f ON f.doc_id = n.doc_id AND f.term = n.term
  JOIN dang{i} dg ON dg.doc_id = n.doc_id
)"""
        )
    parts.append(
        f""",
rk AS (
  SELECT doc_id, term, pr,
         row_number() OVER (PARTITION BY doc_id ORDER BY pr DESC, term ASC) AS rk
  FROM pr{n_iters}
)
SELECT cast(doc_id AS BIGINT) AS doc_id, term,
       cast(round(pr * 100000) AS BIGINT) AS pr_5dp
FROM rk WHERE rk <= {TR_TOPK}"""
    )
    return "".join(parts)


ORACLES["textrank_top"] = _textrank_oracle()


def lloyd_prefix(k: int, n_iters: int) -> str:
    """WITH-chain computing deterministic Lloyd k-means in DuckDB over the
    embeddings table: v (prepped vectors), c0..c{n_iters} (centroids per
    iteration; c{n_iters} = final). Shared by the kmeans_clusters oracle
    and the IVF probe/rerank oracle (entry_queries_r5)."""
    parts = [
        f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
c0 AS MATERIALIZED (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, e AS c
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(1, n_iters + 1):
        c_prev = f"c{i - 1}"
        parts.append(
            f""",
a{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_cosine_similarity(v.e, c.c), 9) DESC,
                                       c.cluster ASC) AS rk
    FROM v CROSS JOIN {c_prev} c
  ) WHERE rk = 1
),
u{i} AS MATERIALIZED (
  SELECT cluster, pos, round(avg(val), 9) AS x FROM (
    SELECT a.cluster, unnest(v.e) AS val, generate_subscripts(v.e, 1) AS pos
    FROM a{i} a JOIN v USING (vec_id)
  ) GROUP BY cluster, pos
),
nc{i} AS MATERIALIZED (SELECT cluster, list(x ORDER BY pos) AS c FROM u{i} GROUP BY cluster),
c{i} AS MATERIALIZED (
  SELECT p.cluster, coalesce(nc.c, p.c) AS c
  FROM {c_prev} p LEFT JOIN nc{i} nc USING (cluster)
)"""
        )
    return "".join(parts)


def _kmeans_oracle() -> str:
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
)
SELECT cast(vec_id AS BIGINT) AS vec_id, cast(cluster AS BIGINT) AS cluster
FROM fin"""
    )


ORACLES["kmeans_clusters"] = _kmeans_oracle()

ORACLES["related_docs"] = f"""{_SQL_BASE},
w AS (
  SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
  FROM tf JOIN idf USING (term)
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
wn AS (SELECT w.doc_id, w.term, w.w / norms.norm AS wn
       FROM w JOIN norms USING (doc_id)),
pairs AS (
  SELECT s.doc_id AS seed_id, o.doc_id AS doc_id,
         round(sum(s.wn * o.wn), 9) AS cosine
  FROM wn s JOIN wn o USING (term)
  WHERE s.doc_id % {REC_MOD} = 0 AND o.doc_id <> s.doc_id
  GROUP BY s.doc_id, o.doc_id
),
rk AS (
  SELECT seed_id, doc_id, cosine,
         row_number() OVER (PARTITION BY seed_id
                            ORDER BY cosine DESC, doc_id ASC) AS rec_rank
  FROM pairs
)
SELECT cast(seed_id AS BIGINT) AS seed_id, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(cosine * 100000) AS BIGINT) AS cosine_5dp,
       cast(rec_rank AS BIGINT) AS rec_rank
FROM rk WHERE rec_rank <= {REC_TOPN}
"""


ORACLES["key_sentences"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
t AS (SELECT doc_id, unnest(tl) AS term, generate_subscripts(tl, 1) AS pos FROM toks),
sent AS MATERIALIZED (
  SELECT doc_id, cast(floor((pos - 1) / {SUM_CHUNK}) AS INT) AS position,
         string_agg(term, ' ' ORDER BY pos) AS sentence, count(*) AS n_tokens
  FROM t GROUP BY doc_id, position
  HAVING count(*) BETWEEN 5 AND 100
),
stok AS MATERIALIZED (
  SELECT doc_id, position, n_tokens,
         unnest(string_split(sentence, ' ')) AS term
  FROM sent
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM stok GROUP BY doc_id, term),
ns AS (SELECT doc_id, cast(count(*) AS DOUBLE) AS n_sent FROM sent GROUP BY doc_id),
dfs AS (SELECT doc_id, term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, position, term FROM stok)
        GROUP BY doc_id, term),
sc AS (
  SELECT s.doc_id, s.position,
         round(sum(tf.tf * ln(ns.n_sent / dfs.df)) / s.n_tokens
               * (1 + 0.5 / (1 + s.position)), 9) AS score
  FROM stok s
  JOIN tf USING (doc_id, term)
  JOIN dfs USING (doc_id, term)
  JOIN ns USING (doc_id)
  GROUP BY s.doc_id, s.position, s.n_tokens
),
rk AS (
  SELECT doc_id, position, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, position ASC) AS rk
  FROM sc
)
SELECT cast(rk.doc_id AS BIGINT) AS doc_id,
       cast(rk.position AS BIGINT) AS position, sent.sentence,
       cast(round(rk.score * 100000) AS BIGINT) AS score_5dp
FROM rk JOIN sent USING (doc_id, position) WHERE rk.rk <= {SUM_K}
"""


def registry() -> dict:
    return {
        "rake_top": q_rake_top,
        "textrank_top": q_textrank_top,
        "kmeans_clusters": q_kmeans_clusters,
        "related_docs": q_related_docs,
        "key_sentences": q_key_sentences,
    }
