"""Driver-contract registry, batch 2: boolean/phrase/proximity/expansion
operators, dedup, similarity search, text quality, eval metrics.

Same discipline as entry_queries.py: constants shared between the Spark
code and the generated DuckDB SQL; floats exported as *_5dp bigints; ranks
computed on 9dp-rounded scores where cross-engine ulp flips are possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs, _index, _qterms, _INDEX_CACHE, K1, B, QUERY_SET, TOPK, _SQL_BASE, _SQL_BM25_SCORED
from .index.build import build_positional
from .ops.textstats import EN_STOPWORDS

BOOL_QUERY = "(fast AND scan) OR (slow AND NOT value)"
PHRASE = ("fast", "scan")
NEAR_TERMS, NEAR_DIST = ("fast", "value"), 3
WILDCARD_PREFIX = "sc"
FUZZY_TERM, FUZZY_DIST = "scann", 1
COSINE_QIDS = [0, 1, 2, 3, 4]
JACCARD_THRESHOLD = 0.5
DUP_EVERY = 10  # every 10th doc gets a truncated near-duplicate


def _positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("pos", id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_positional(_docs(spark, sf_dir)).persist()
    return _INDEX_CACHE[key]


def _e5(col: str, name: str):
    return F.round(F.col(col) * 100000).cast("long").alias(name)


# ------------------------------------------------------------------ boolean
def q_bool_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.boolean import BooleanEngine

    eng = BooleanEngine(_index(spark, sf_dir))
    return eng.query(BOOL_QUERY).select(F.col("doc_id").cast("long").alias("doc_id"))


def q_bool_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.boolean import BooleanEngine

    eng = BooleanEngine(_index(spark, sf_dir))
    return eng.query("fast AND scan", rank=True).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("long").alias("sum_tf"),
    )


def q_phrase_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.phrase import phrase_match

    return phrase_match(_positional(spark, sf_dir), list(PHRASE)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("match_count").cast("long").alias("match_count"),
    )


def q_near_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.phrase import proximity_match

    return proximity_match(
        _positional(spark, sf_dir), NEAR_TERMS[0], NEAR_TERMS[1], NEAR_DIST
    ).select(F.col("doc_id").cast("long").alias("doc_id"))


def q_wildcard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.boolean import BooleanEngine

    eng = BooleanEngine(_index(spark, sf_dir))
    return eng.query(f"{WILDCARD_PREFIX}*").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


def q_fuzzy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.expand import fuzzy_terms

    idx = _index(spark, sf_dir)
    return (
        fuzzy_terms(idx, FUZZY_TERM, FUZZY_DIST, cap=50)
        .join(idx.term_stats, "term")
        .select("term", F.col("df").cast("long").alias("df"), F.col("dist").cast("long").alias("dist"))
    )


# -------------------------------------------------------------------- dedup
def q_content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import content_hash_col

    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        content_hash_col(F.col("text")).alias("content_hash"),
    )


def _derived_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ truncated copies of every DUP_EVERY-th doc — a corpus
    with KNOWN near-duplicates, derivable identically in SQL."""
    d = _docs(spark, sf_dir)
    extra = d.filter(F.col("doc_id") % DUP_EVERY == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(n_chars * 0.8) as int))").alias("text"),
    )
    return d.select("doc_id", "text").unionByName(extra)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _derived_dup_docs(spark, sf_dir), k=2, threshold=JACCARD_THRESHOLD
    )
    return pairs.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        _e5("jaccard", "jaccard_5dp"),
    )


def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: exact Jaccard pairs → connected components →
    (doc_id, component=min reachable id). The DuckDB oracle recomputes
    the transitive closure with a recursive CTE over the same pairs."""
    from .ops.dedup import _eager_release, dup_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _derived_dup_docs(spark, sf_dir), k=2, threshold=JACCARD_THRESHOLD
    )
    labels = dup_components(pairs)
    out = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )
    # stays distributed: materialize the (small) labeling, then release
    # the CC iteration caches (dedup._eager_release convention)
    return _eager_release(out, labels, pairs)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH with rows-per-band = 1 (32 hashes / 32 bands): a pair
    with true Jaccard j is missed w.p. (1-j)^32 ≤ 2.3e-10 at the 0.5
    threshold, so the verified output EQUALS the exact all-pairs Jaccard
    set and registers against the same oracle — a real hash-green gate on
    the LSH pipeline, not a rows-only count. (Production banding keeps
    fewer, wider bands to bound candidate volume; rows=1 is the
    completeness configuration.)"""
    from .ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _derived_dup_docs(spark, sf_dir), k=2, threshold=JACCARD_THRESHOLD,
        num_hashes=32, bands=32,
    ).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        _e5("jaccard", "jaccard_5dp"),
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (JVM bit-vote fingerprints) with 16 four-bit bands: the
    pigeonhole guarantee covers Hamming ≤ 15, so every planted truncation
    near-dup (measured ≤ 14 on this corpus) MUST surface — the output is
    the planted pairs recovered by the full LSH pipeline and the oracle is
    the exact planted-pair set (completeness gate, not rows-only)."""
    from .ops.dedup import simhash_candidates

    cand = simhash_candidates(
        _derived_dup_docs(spark, sf_dir), hamming=15, bands=16
    )
    planted = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % DUP_EVERY == 0)
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 100000).alias("doc_b"),
        )
    )
    return cand.join(planted, ["doc_a", "doc_b"], "inner").select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
    )


# --------------------------------------------------------------- similarity
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.similarity import cosine_topk

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk(vecs, COSINE_QIDS, k=TOPK)
    # rank on 9dp-rounded cosine for cross-engine stability
    from pyspark.sql import Window

    base = out.drop("rank")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("vec_id")
    )
    return (
        base.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            _e5("cosine", "cosine_5dp"),
        )
    )


# ------------------------------------------------------------- text quality
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import quality_features

    return quality_features(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").alias("n_tokens"),
        _e5("avg_token_len", "avg_token_len_5dp"),
        _e5("stopword_ratio", "stopword_ratio_5dp"),
        _e5("quality_score", "quality_5dp"),
    )


# ------------------------------------------------------------- eval metrics
def _qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic graded qrels derivable in pure SQL: for query i (1-based),
    rel=2 where doc_id%13==i, rel=1 where doc_id%13==i+5."""
    d = _docs(spark, sf_dir).select("doc_id")
    parts = []
    for i, qid in enumerate(QUERY_SET, start=1):
        parts.append(
            d.withColumn("query_id", F.lit(qid)).withColumn(
                "rel",
                F.when(F.col("doc_id") % 13 == i, 2)
                .when(F.col("doc_id") % 13 == i + 5, 1)
                .otherwise(0),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("rel") > 0).select("query_id", "doc_id", "rel")


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eval.metrics import per_query_metrics
    from .query.bm25 import score_bm25, topk

    idx = _index(spark, sf_dir)
    scored = score_bm25(idx, _qterms(spark), k1=K1, b=B).withColumn(
        "score", F.round("score", 9)
    )
    ranked = topk(scored, k=TOPK).select(
        "query_id", "doc_id", "rank"
    )
    m = per_query_metrics(ranked, _qrels(spark, sf_dir), k=TOPK)
    return m.select(
        "query_id",
        _e5("p_at_k", "p_at_k_5dp"),
        _e5("r_at_k", "r_at_k_5dp"),
        _e5("f1", "f1_5dp"),
        _e5("ap", "ap_5dp"),
        _e5("rr", "rr_5dp"),
        _e5("ndcg", "ndcg_5dp"),
        _e5("err", "err_5dp"),
        _e5("rbp", "rbp_5dp"),
        _e5("bpref", "bpref_5dp"),
        _e5("r_prec", "r_prec_5dp"),
        _e5("success", "success_5dp"),
    )


# ---------------------------------------------------------------- oracles
_SW_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_QIDX_VALUES = ", ".join(f"('{qid}', {i})" for i, qid in enumerate(QUERY_SET, start=1))

_TOKS_CTE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)
"""

ORACLES: dict[str, str] = {}

ORACLES["bool_docs"] = f"""{_SQL_BASE}
SELECT cast(d.doc_id AS BIGINT) AS doc_id FROM dl d
WHERE (EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'fast')
       AND EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'scan'))
   OR (EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'slow')
       AND NOT EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'value'))
"""

ORACLES["bool_ranked"] = f"""{_SQL_BASE}
SELECT cast(d.doc_id AS BIGINT) AS doc_id,
       cast((SELECT sum(tf.tf) FROM tf
             WHERE tf.doc_id = d.doc_id AND tf.term IN ('fast','scan')) AS BIGINT) AS sum_tf
FROM dl d
WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'fast')
  AND EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'scan')
"""

ORACLES["phrase_docs"] = f"""{_TOKS_CTE}
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(len(list_filter(range(1, len(l)),
            i -> l[i] = '{PHRASE[0]}' AND l[i+1] = '{PHRASE[1]}')) AS BIGINT) AS match_count
FROM t
WHERE len(list_filter(range(1, len(l)),
      i -> l[i] = '{PHRASE[0]}' AND l[i+1] = '{PHRASE[1]}')) > 0
"""

ORACLES["near_docs"] = f"""{_TOKS_CTE}
SELECT cast(doc_id AS BIGINT) AS doc_id
FROM t
WHERE len(list_filter(range(1, len(l) + 1),
      i -> l[i] = '{NEAR_TERMS[0]}' AND
           len(list_filter(range(greatest(i - {NEAR_DIST}, 1), least(i + {NEAR_DIST}, len(l)) + 1),
               j -> l[j] = '{NEAR_TERMS[1]}')) > 0)) > 0
"""

ORACLES["wildcard_docs"] = f"""{_TOKS_CTE}
SELECT cast(doc_id AS BIGINT) AS doc_id
FROM t
WHERE len(list_filter(l, x -> x LIKE '{WILDCARD_PREFIX}%')) > 0
"""

ORACLES["fuzzy_terms"] = f"""{_SQL_BASE}
SELECT term, cast(df AS BIGINT) AS df,
       cast(levenshtein(term, '{FUZZY_TERM}') AS BIGINT) AS dist
FROM df
WHERE levenshtein(term, '{FUZZY_TERM}') <= {FUZZY_DIST}
"""

ORACLES["content_hashes"] = """
SELECT cast(doc_id AS BIGINT) AS doc_id, md5(text) AS content_hash FROM documents
"""

_DERIVED = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, cast(floor(n_chars * 0.8) AS INT))
  FROM documents WHERE doc_id % {DUP_EVERY} = 0
),
tt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l FROM docs2),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS shingle
    FROM tt
  )
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
"""

ORACLES["jaccard_pairs"] = f"""{_DERIVED}
SELECT cast(doc_a AS BIGINT) AS doc_a, cast(doc_b AS BIGINT) AS doc_b,
       cast(round(inter * 1.0 / (sa.sz + sb.sz - inter) * 100000) AS BIGINT) AS jaccard_5dp
FROM pairs
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
"""

_cos_ids = ", ".join(str(i) for i in COSINE_QIDS)
ORACLES["cosine_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id IN ({_cos_ids})),
s AS (SELECT q.qid AS query_id, v.vec_id,
             list_cosine_similarity(v.e, q.qe) AS cosine
      FROM v CROSS JOIN q WHERE v.vec_id <> q.qid),
rk AS (SELECT query_id, vec_id, cosine,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(cosine, 9) DESC, vec_id ASC) AS rank
       FROM s)
SELECT cast(query_id AS BIGINT) AS query_id, cast(rank AS BIGINT) AS rank,
       cast(vec_id AS BIGINT) AS vec_id,
       cast(round(cosine * 100000) AS BIGINT) AS cosine_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["text_quality"] = f"""{_TOKS_CTE}
, feat AS (
  SELECT doc_id,
         len(l) AS n_tokens,
         CASE WHEN len(l) > 0
              THEN list_aggregate(list_transform(l, x -> length(x)), 'sum') * 1.0 / len(l)
              ELSE 0.0 END AS avg_token_len,
         CASE WHEN len(l) > 0
              THEN len(list_filter(l, x -> x IN ({_SW_LIST}))) * 1.0 / len(l)
              ELSE 0.0 END AS sw_ratio
  FROM t
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(n_tokens AS BIGINT) AS n_tokens,
       cast(round(avg_token_len * 100000) AS BIGINT) AS avg_token_len_5dp,
       cast(round(sw_ratio * 100000) AS BIGINT) AS stopword_ratio_5dp,
       cast(round((
          least(n_tokens / 20.0, 1.0) * 0.4
          + greatest(1.0 - 0.0 * 5.0, 0.0) * 0.2
          + CASE WHEN avg_token_len >= 2.5 AND avg_token_len <= 10.0 THEN 1.0 ELSE 0.5 END * 0.2
          + CASE WHEN sw_ratio > 0.05 AND sw_ratio < 0.7 THEN 1.0 ELSE 0.6 END * 0.2
       ) * 100000) AS BIGINT) AS quality_5dp
FROM feat
"""

# rows=1 banding makes the LSH output provably equal to the exact set
ORACLES["minhash_pairs"] = ORACLES["jaccard_pairs"]

# transitive closure over the verified pair set: WITH RECURSIVE reuses the
# derived-corpus CTE chain, symmetrizes the edges, and takes min reachable id
ORACLES["dup_groups"] = (
    "WITH RECURSIVE "
    + _DERIVED.strip().removeprefix("WITH")
    + f""",
tp AS (
  SELECT doc_a, doc_b FROM pairs
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM tp
  UNION ALL
  SELECT doc_b, doc_a FROM tp
),
verts AS (SELECT DISTINCT s AS node FROM edges),
reach AS (
  SELECT node, node AS r FROM verts
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node
"""
)

ORACLES["simhash_pairs"] = f"""
SELECT cast(doc_id AS BIGINT) AS doc_a,
       cast(doc_id + 100000 AS BIGINT) AS doc_b
FROM documents WHERE doc_id % {DUP_EVERY} = 0
"""

ORACLES["eval_metrics"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
rk AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored),
qidx(query_id, qi) AS (VALUES {_QIDX_VALUES}),
qrels AS (
  SELECT qidx.query_id, d.doc_id,
         CASE WHEN d.doc_id % 13 = qidx.qi THEN 2
              WHEN d.doc_id % 13 = qidx.qi + 5 THEN 1
              ELSE 0 END AS rel
  FROM dl d CROSS JOIN qidx
),
qr AS (SELECT * FROM qrels WHERE rel > 0),
totals AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY query_id),
j AS (
  SELECT r.query_id, r.rank, coalesce(qr.rel, 0) AS rel
  FROM rk r LEFT JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
  WHERE r.rank <= {TOPK}
),
j2 AS (
  SELECT j.query_id, rank, rel, t.n_rel,
         CASE WHEN rel > 0 THEN 1 ELSE 0 END AS is_hit,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY j.query_id ORDER BY rank) AS cum_hits,
         (pow(2.0, rel) - 1.0) / log2(rank + 1.0) AS dcg_term,
         (pow(2.0, rel) - 1.0) / pow(2.0, 3.0) AS err_r,
         coalesce(sum(ln(1.0 - (pow(2.0, rel) - 1.0) / pow(2.0, 3.0)))
           OVER (PARTITION BY j.query_id ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS err_logcont,
         0.2 * pow(0.8, rank - 1) * (CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS rbp_term,
         coalesce(sum(CASE WHEN rel > 0 THEN 0 ELSE 1 END)
           OVER (PARTITION BY j.query_id ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nonrel_before
  FROM j JOIN totals t USING (query_id)
),
agg AS (
  SELECT query_id,
         sum(is_hit) AS hits,
         sum(cum_hits * 1.0 / rank * is_hit) AS sum_prec_hits,
         min(CASE WHEN is_hit = 1 THEN rank END) AS first_hit,
         sum(dcg_term) AS dcg,
         sum(err_r * exp(err_logcont) / rank) AS err,
         sum(rbp_term) AS rbp,
         sum(is_hit * (1.0 - least(nonrel_before, n_rel) * 1.0 / n_rel)) AS sum_bpref,
         sum(is_hit * (CASE WHEN rank <= n_rel THEN 1 ELSE 0 END)) AS rprec_hits
  FROM j2 GROUP BY query_id
),
ideal AS (
  SELECT query_id, sum((pow(2.0, rel) - 1.0) / log2(irank + 1.0)) AS idcg
  FROM (SELECT query_id, rel,
               row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank
        FROM qr) WHERE irank <= {TOPK}
  GROUP BY query_id
)
SELECT a.query_id,
       cast(round(a.hits * 1.0 / {TOPK} * 100000) AS BIGINT) AS p_at_k_5dp,
       cast(round(a.hits * 1.0 / t.n_rel * 100000) AS BIGINT) AS r_at_k_5dp,
       cast(round(CASE WHEN a.hits > 0 THEN
              2.0 * (a.hits * 1.0 / {TOPK}) * (a.hits * 1.0 / t.n_rel)
              / (a.hits * 1.0 / {TOPK} + a.hits * 1.0 / t.n_rel)
            ELSE 0.0 END * 100000) AS BIGINT) AS f1_5dp,
       cast(round(a.sum_prec_hits / t.n_rel * 100000) AS BIGINT) AS ap_5dp,
       cast(round(coalesce(1.0 / a.first_hit, 0.0) * 100000) AS BIGINT) AS rr_5dp,
       cast(round(coalesce(a.dcg / i.idcg, 0.0) * 100000) AS BIGINT) AS ndcg_5dp,
       cast(round(a.err * 100000) AS BIGINT) AS err_5dp,
       cast(round(a.rbp * 100000) AS BIGINT) AS rbp_5dp,
       cast(round(a.sum_bpref / t.n_rel * 100000) AS BIGINT) AS bpref_5dp,
       cast(round(a.rprec_hits * 1.0 / t.n_rel * 100000) AS BIGINT) AS r_prec_5dp,
       cast(round(CASE WHEN a.hits > 0 THEN 1.0 ELSE 0.0 END * 100000) AS BIGINT) AS success_5dp
FROM agg a JOIN totals t USING (query_id) LEFT JOIN ideal i USING (query_id)
"""


def registry() -> dict:
    return {
        "bool_docs": q_bool_docs,
        "bool_ranked": q_bool_ranked,
        "phrase_docs": q_phrase_docs,
        "near_docs": q_near_docs,
        "wildcard_docs": q_wildcard_docs,
        "fuzzy_terms": q_fuzzy_terms,
        "content_hashes": q_content_hashes,
        "jaccard_pairs": q_jaccard_pairs,
        "dup_groups": q_dup_groups,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "cosine_topk": q_cosine_topk,
        "text_quality": q_text_quality,
        "eval_metrics": q_eval_metrics,
    }
