"""Driver-contract registry, batch 3: facets/field/date filters, language
ID, snippets, window queries, collocations + n-grams, BM25 explain,
MaxScore parity, linear hybrid fusion, Rocchio PRF expansion,
embedding-pair dedup (exact + LSH), document fingerprints, multimodal
feature plumbing.

Reference parity targets (SURVEY.md §2): A2 facet counts
(src/ir_app/services/facet_service.py:123-215), Q11 field query
(src/ir/retrieval/boolean.py:464-497), Q12 date range
(src/ir/index/field_indexer.py:302-331), Q8 window query
(src/ir/index/positional_index.py:395-469), Q14 BM25 explain
(src/ir/retrieval/bm25.py:326-404), Q19 MaxScore
(src/ir/retrieval/query_optimization.py:413-612 — degenerate: scores every
candidate, so results ≡ exhaustive BM25; we register the parity entry
against the BM25 oracle rather than replicate the degeneracy), Q21 linear
fusion (src/ir/ranking/hybrid.py:100-433), Q24 Rocchio
(src/ir/ranking/rocchio.py:71-460), Q26 snippet/KWIC
(src/ir_app/services/search_service.py:627-703), A4/A5 n-grams +
collocations (src/ir/langmodel/ngram.py:128-467, collocation.py:137-518).

Same output discipline as the other batches: shared constants on both
sides, ranks on 9dp-rounded floats, exported floats as *_5dp bigints.
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
    _SQL_TFIDF_SCORED,
    B,
    K1,
    TOPK,
)
from .entry_queries import ORACLES as _ORC1  # noqa: F401  (shared style)
from .query.bm25 import bm25_topk, explain_scores, score_bm25, topk
from .query.hybrid import linear_fuse
from .query.vsm import score_tfidf

# ----------------------------------------------------------------- fixtures
FIELD_SOURCE = "src18"
DATE_LO, DATE_HI = "2024-01-10", "2024-01-20"
SNIPPET_TERM, SNIPPET_CTX, SNIPPET_LEN = "fast", 20, 50
WINDOW_TERMS, WINDOW_N = ("fast", "scan", "value"), 6
COLLOC_MIN, COLLOC_TOPN = 5, 20
TRIGRAM_TOPN = 20
PAIRS_TOPN = 20
ROCCHIO_ALPHA, ROCCHIO_BETA, ROCCHIO_MAX, ROCCHIO_MINW, ROCCHIO_FBK = (
    1.0,
    0.75,
    8,
    0.01,
    10,
)
# γ negative feedback (reference rocchio.py:100 default 0.15): the bottom
# NEGK BM25 candidates per query stand in for explicit non-relevant docs
ROCCHIO_GAMMA, ROCCHIO_NEGK = 0.15, 10
HYBRID_DEPTH, W_LIN_BM25, W_LIN_TFIDF = 50, 0.65, 0.35
EXPLAIN_QID = "q1"


def _e5(col: str, name: str):
    return F.round(F.col(col) * 100000).cast("long").alias(name)


# ------------------------------------------------------------------- facets
def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: facet value counts over metadata columns — in Spark these are
    plain groupBy aggregations with partition pruning, not a side index."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def q_field_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11/Q23: field-filtered retrieval. The reference retrieves ALL docs
    then filters (search_service.py:108,158); we push the metadata filter
    below scoring — strictly better plan, identical results."""
    idx = _index(spark, sf_dir)
    allowed = _docs(spark, sf_dir).filter(F.col("source") == FIELD_SOURCE).select(
        "doc_id"
    )
    scored = score_bm25(idx, _qterms(spark), k1=K1, b=B).join(
        F.broadcast(allowed), "doc_id"
    )
    scored = scored.withColumn("score", F.round("score", 9))
    return topk(scored, k=TOPK).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5("score", "score_5dp"),
    )


def q_date_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: date-range filter + per-type rollup over the events table —
    Catalyst pushes the ts predicate to the parquet scan (min/max pruning),
    vs the reference's O(N) dict scan."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.filter((F.col("ts") >= DATE_LO) & (F.col("ts") < DATE_HI))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value") * 100000).cast("long").alias("sum_value_5dp"),
        )
    )


# ------------------------------------------------------------ text pipeline
def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline language-ID heuristic over documents."""
    from .ops.textstats import lang_id_col

    return (
        _docs(spark, sf_dir)
        .select(lang_id_col(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def q_snippet_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26 KWIC snippet: fixed-width context window around the first
    occurrence of the query term (reference picks best sentence; the KWIC
    generator is src/ir/summarize/dynamic.py:100-472)."""
    d = _docs(spark, sf_dir)
    pos = F.locate(SNIPPET_TERM, F.col("text"))
    return (
        d.filter(pos > 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.expr(
                f"substring(text, greatest(1, locate('{SNIPPET_TERM}', text) - {SNIPPET_CTX}), {SNIPPET_LEN})"
            ).alias("snippet"),
        )
    )


def q_window_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: all terms within one token window."""
    from .entry_queries_ops import _positional
    from .query.phrase import window_match

    return window_match(
        _positional(spark, sf_dir), list(WINDOW_TERMS), WINDOW_N
    ).select(F.col("doc_id").cast("long").alias("doc_id"))


# -------------------------------------------------------- ngrams / colloc
def q_colloc_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: top bigram collocations by PMI (min_count floor)."""
    from .ops.collocation import collocations

    c = collocations(_docs(spark, sf_dir), min_count=COLLOC_MIN)
    w = Window.orderBy(
        F.desc(F.round("pmi", 9)), F.asc("w1"), F.asc("w2")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= COLLOC_TOPN)
        .select(
            "w1",
            "w2",
            F.col("n11").cast("long").alias("n11"),
            _e5("pmi", "pmi_5dp"),
            _e5("dice", "dice_5dp"),
            _e5("llr", "llr_5dp"),
        )
    )


def q_trigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: top trigram counts."""
    from .ops.collocation import ngram_counts

    g = ngram_counts(_docs(spark, sf_dir), n=3).select(
        F.col("ngram").alias("gram"), "cnt"
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        g.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TRIGRAM_TOPN)
        .select("gram", F.col("cnt").cast("long").alias("cnt"))
    )


# ------------------------------------------------------------ score surface
def q_bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: per-(doc, term) score breakdown for one query."""
    idx = _index(spark, sf_dir)
    ex = explain_scores(idx, _qterms(spark), k1=K1, b=B).filter(
        F.col("query_id") == EXPLAIN_QID
    )
    return ex.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        _e5("idf", "idf_5dp"),
        _e5("term_score", "term_score_5dp"),
    )


def q_maxscore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 parity: the reference's MaxScore is degenerate (essential set =
    all terms, max_non_essential_score=0.0 → scores every candidate,
    query_optimization.py:556-580), so its results are exactly exhaustive
    BM25. Registered against the BM25 oracle."""
    from .entry_queries import q_bm25_topk

    return q_bm25_topk(spark, sf_dir)


def q_hybrid_linear_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: weighted CombSUM with per-query min-max normalization over
    depth-50 inner rankings."""
    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    r1 = topk(
        score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)),
        k=HYBRID_DEPTH,
    )
    r2 = topk(
        score_tfidf(idx, q).withColumn("score", F.round("score", 9)),
        k=HYBRID_DEPTH,
    )
    fused = linear_fuse([(r1, W_LIN_BM25), (r2, W_LIN_TFIDF)])
    fused = fused.withColumn("score", F.round("score", 9))
    return topk(fused, k=TOPK).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5("score", "score_5dp"),
    )


def q_rocchio_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24: Rocchio expansion terms — top-10 BM25 docs as relevant (β),
    bottom-10 scored candidates as non-relevant (γ=0.15 subtraction with
    the reference's clamp-at-0, rocchio.py:264-275)."""
    from pyspark.sql import Window as _W

    from .query.rocchio import rocchio_expand

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    scored = score_bm25(idx, q, k1=K1, b=B).withColumn(
        "score", F.round("score", 9)
    )
    fb = topk(scored, k=ROCCHIO_FBK).select("query_id", "doc_id")
    wneg = _W.partitionBy("query_id").orderBy(
        F.asc("score"), F.desc("doc_id")
    )
    neg = (
        scored.withColumn("rk", F.row_number().over(wneg))
        .filter(F.col("rk") <= ROCCHIO_NEGK)
        .select("query_id", "doc_id")
    )
    out = rocchio_expand(
        idx,
        q,
        fb,
        alpha=ROCCHIO_ALPHA,
        beta=ROCCHIO_BETA,
        gamma=ROCCHIO_GAMMA,
        neg_feedback=neg,
        max_terms=ROCCHIO_MAX,
        min_weight=ROCCHIO_MINW,
        rank_dp=9,
    )
    return out.select("query_id", "term", _e5("weight", "weight_5dp"))


COMPOSITE_BOOL = "(fast AND sc*) OR (slow NEAR/3 value) AND NOT source:src18"


def q_bool_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 end-to-end: one query string exercising wildcard expansion,
    positional NEAR, metadata field filter, NOT, parens and precedence
    (NOT > AND/NEAR > OR) through the full parser+compiler."""
    from .entry_queries_ops import _positional
    from .query.boolean import BooleanEngine

    eng = BooleanEngine(_index(spark, sf_dir), positional=_positional(spark, sf_dir))
    return eng.query(COMPOSITE_BOOL).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


# ------------------------------------------------------- embedding pairs
def q_embed_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: exact top-N most-similar pairs (the
    brute-force baseline; LSH variant below is the scale path)."""
    from .ops.similarity import _dot, _norm_col

    v = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("ia"),
            F.col("embedding").cast("array<double>").alias("va"),
        )
        .withColumn("na", _norm_col(F.col("va")))
    )
    w = v.select(
        F.col("ia").alias("ib"), F.col("va").alias("vb"), F.col("na").alias("nb")
    )
    pairs = (
        v.join(F.broadcast(w), F.col("ia") < F.col("ib"))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    )
    wr = Window.orderBy(F.desc(F.round("cosine", 9)), F.asc("ia"), F.asc("ib"))
    return (
        pairs.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= PAIRS_TOPN)
        .select(
            F.col("rk").cast("long").alias("rank"),
            F.col("ia").cast("long").alias("ia"),
            F.col("ib").cast("long").alias("ib"),
            _e5("cosine", "cosine_5dp"),
        )
    )


EMBED_DIM, LSH_PLANES, LSH_SEED = 64, 8, 42


def _lsh_signs():
    from .ops.similarity import rademacher_signs

    return rademacher_signs(EMBED_DIM, LSH_PLANES, seed=LSH_SEED)


def q_embed_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidate pairs, fully oracle-checked: ±1 (Rademacher)
    hyperplanes are shared with the DuckDB oracle as a VALUES table and
    the sign decision uses a 6dp-rounded dot product (measured sign margin
    on this corpus ≈ 1e-3), so BOTH engines derive identical buckets —
    the whole candidate-generation pipeline is hash-verified, not
    rows-only. Bucketing is a pure JVM Column expression (no Python)."""
    from .ops.similarity import _dot, _norm_col, bucket_col

    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = (
        raw.select(
            F.col("vec_id").alias("ia"),
            F.col("embedding").cast("array<double>").alias("va"),
        )
        .withColumn("na", _norm_col(F.col("va")))
        .withColumn("bucket", bucket_col(F.col("va"), _lsh_signs()))
    )
    w = v.select(
        F.col("ia").alias("ib"),
        F.col("va").alias("vb"),
        F.col("na").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = (
        v.join(w, (F.col("ia") < F.col("ib")) & (F.col("bucket") == F.col("bucket_b")))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.round("cosine", 9) > 0.0)
    )
    return pairs.select(
        F.col("ia").cast("long").alias("ia"),
        F.col("ib").cast("long").alias("ib"),
        _e5("cosine", "cosine_5dp"),
    )


def q_eval_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 run-level evaluation (reference metrics.py:949,581): MAP, MRR,
    mean nDCG, GMAP over the per-query metrics."""
    from .entry_queries_ops import q_eval_metrics

    m = q_eval_metrics(spark, sf_dir)
    return m.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("ap_5dp")).cast("long").alias("map_5dp"),
        F.round(F.avg("rr_5dp")).cast("long").alias("mrr_5dp"),
        F.round(F.avg("ndcg_5dp")).cast("long").alias("mean_ndcg_5dp"),
        F.round(F.avg("err_5dp")).cast("long").alias("mean_err_5dp"),
        F.round(F.avg("bpref_5dp")).cast("long").alias("mean_bpref_5dp"),
        F.round(F.exp(F.avg(F.log(F.greatest(F.col("ap_5dp").cast("double"), F.lit(1.0))))))
        .cast("long")
        .alias("gmap_5dp"),
    )


def q_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 parity (reference compression.py:642-699): physical size of the
    delta+varint block index vs the 4-byte-per-int baseline. The oracle
    recomputes the exact per-value varint byte counts from first
    principles, so this cross-checks the codec's on-disk size semantics,
    not just its round-trip."""
    from .index.segments import build_blocked_postings

    idx = _index(spark, sf_dir)
    blocks = build_blocked_postings(idx.postings, term_dict=idx.term_stats)
    return blocks.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_postings"),
        F.sum("nbytes").cast("long").alias("enc_bytes"),
        F.round(F.sum("nbytes") / (12.0 * F.sum("n")) * 100000)
        .cast("long")
        .alias("ratio_5dp"),
    )


# --------------------------------------------------- fingerprints / media
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline document fingerprint: winnowing-style min of
    bounded polynomial hashes over char 8-grams, as a PURE JVM expression
    whose arithmetic the DuckDB oracle reproduces exactly (hash-green; the
    old uint64-wraparound UDF could not be cross-checked)."""
    from .ops.textstats import fingerprint_col

    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        fingerprint_col(F.col("text")).alias("fingerprint"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload → per-item feature vector via
    mapInPandas. The DECODE is stubbed (real decoder drops into
    ops/multimodal._decode_one), but the payload follows an arithmetic
    byte pattern and the stub's stripe-mean features quantize through
    float32 at one well-defined point, so the DuckDB oracle recomputes the
    whole pipeline output from first principles — the plumbing is
    hash-verified even though the decode is fake."""
    from .ops.multimodal import extract_features, synth_media

    media = synth_media(spark, n=N_MEDIA, seed=MEDIA_SEED)
    feats = extract_features(media, fake=True)
    return feats.select(
        F.col("media_id").cast("long").alias("media_id"),
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x) * 100000
        )
        .cast("long")
        .alias("feat_sum_5dp"),
    )


FRAME_EVERY_MS = 250


def q_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing: one row per sampled timestamp
    per video (pure JVM sequence+explode; actual frame decode is the
    stubbed step). Oracle reproduces the synthetic duration formula and
    unnests the same inclusive 0..duration stride."""
    from .ops.multimodal import frame_sample, synth_media

    media = synth_media(spark, n=N_MEDIA, seed=MEDIA_SEED)
    return frame_sample(media, every_ms=FRAME_EVERY_MS).select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("frame_ms").cast("long").alias("frame_ms"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

ORACLES["facet_counts"] = """
SELECT lang, source, cast(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY lang, source
"""

ORACLES["field_bm25_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
flt AS (
  SELECT s.query_id, s.doc_id, round(s.score, 9) AS score
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
  WHERE d.source = '{FIELD_SOURCE}'
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM flt)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["date_range_events"] = f"""
SELECT event_type, cast(count(*) AS BIGINT) AS n_events,
       cast(round(sum(value) * 100000) AS BIGINT) AS sum_value_5dp
FROM events
WHERE ts >= TIMESTAMP '{DATE_LO}' AND ts < TIMESTAMP '{DATE_HI}'
GROUP BY event_type
"""

_SW_IN = ", ".join(
    f"'{w}'"
    for w in (
        "the a an of to and in is are was were for on with as by at from it "
        "this that be or not"
    ).split()
)
ORACLES["lang_id_counts"] = f"""
WITH feat AS (
  SELECT length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS ascii_l,
         greatest(length(text), 1) AS total,
         len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
                         x -> x IN ({_SW_IN}))) > 0 AS has_sw
  FROM documents
),
pred AS (
  SELECT CASE
    WHEN cast(cjk AS DOUBLE) / total > 0.2 THEN 'zh'
    WHEN cast(ascii_l AS DOUBLE) / total > 0.5 AND has_sw THEN 'en'
    WHEN cast(ascii_l AS DOUBLE) / total > 0.5 THEN 'en-ish'
    ELSE 'unk' END AS pred_lang
  FROM feat
)
SELECT pred_lang, cast(count(*) AS BIGINT) AS cnt FROM pred GROUP BY pred_lang
"""

ORACLES["snippet_kwic"] = f"""
SELECT cast(doc_id AS BIGINT) AS doc_id,
       substr(text, greatest(1, strpos(text, '{SNIPPET_TERM}') - {SNIPPET_CTX}), {SNIPPET_LEN}) AS snippet
FROM documents WHERE strpos(text, '{SNIPPET_TERM}') > 0
"""

_W_TERMS = WINDOW_TERMS
ORACLES["window_docs"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
pos AS (
  SELECT doc_id, u.t.term AS term, u.t.pos AS pos
  FROM toks, unnest(list_transform(tl, (x, i) -> struct_pack(term := x, pos := i))) AS u(t)
),
p0 AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM pos WHERE term = '{_W_TERMS[0]}' GROUP BY doc_id),
p1 AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM pos WHERE term = '{_W_TERMS[1]}' GROUP BY doc_id),
p2 AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM pos WHERE term = '{_W_TERMS[2]}' GROUP BY doc_id),
j AS (SELECT p0.doc_id, p0.ps AS a, p1.ps AS b, p2.ps AS c
      FROM p0 JOIN p1 USING (doc_id) JOIN p2 USING (doc_id))
SELECT cast(doc_id AS BIGINT) AS doc_id FROM j
WHERE len(list_filter(a, x -> len(list_filter(b, y -> y >= x AND y < x + {WINDOW_N})) > 0
                            AND len(list_filter(c, z -> z >= x AND z < x + {WINDOW_N})) > 0)) > 0
   OR len(list_filter(b, x -> len(list_filter(a, y -> y >= x AND y < x + {WINDOW_N})) > 0
                            AND len(list_filter(c, z -> z >= x AND z < x + {WINDOW_N})) > 0)) > 0
   OR len(list_filter(c, x -> len(list_filter(a, y -> y >= x AND y < x + {WINDOW_N})) > 0
                            AND len(list_filter(b, z -> z >= x AND z < x + {WINDOW_N})) > 0)) > 0
"""

_BIGRAM_CTE = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(tl[1:len(tl)-1]) AS w1, unnest(tl[2:len(tl)]) AS w2
  FROM toks WHERE len(tl) >= 2
)
"""

ORACLES["colloc_pmi"] = f"""
WITH {_BIGRAM_CTE},
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
         log2((n11 / n) / ((c1 / n) * (c2 / n))) AS pmi,
         2.0 * n11 / (c1 + c2) AS dice,
         2.0 * (
           CASE WHEN n11 > 0 THEN n11 * ln(n11 / (c1 * c2 / n)) ELSE 0 END
         + CASE WHEN c1 - n11 > 0 THEN (c1 - n11) * ln((c1 - n11) / (c1 * (n - c2) / n)) ELSE 0 END
         + CASE WHEN c2 - n11 > 0 THEN (c2 - n11) * ln((c2 - n11) / ((n - c1) * c2 / n)) ELSE 0 END
         + CASE WHEN n - c1 - c2 + n11 > 0 THEN (n - c1 - c2 + n11) * ln((n - c1 - c2 + n11) / ((n - c1) * (n - c2) / n)) ELSE 0 END
         ) AS llr
  FROM j
),
rk AS (SELECT *, row_number() OVER (ORDER BY round(pmi, 9) DESC, w1 ASC, w2 ASC) AS rk FROM m)
SELECT w1, w2, cast(n11 AS BIGINT) AS n11,
       cast(round(pmi * 100000) AS BIGINT) AS pmi_5dp,
       cast(round(dice * 100000) AS BIGINT) AS dice_5dp,
       cast(round(llr * 100000) AS BIGINT) AS llr_5dp
FROM rk WHERE rk <= {COLLOC_TOPN}
"""

ORACLES["trigram_top"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
tg AS (
  SELECT unnest(tl[1:len(tl)-2]) AS g1, unnest(tl[2:len(tl)-1]) AS g2,
         unnest(tl[3:len(tl)]) AS g3
  FROM toks WHERE len(tl) >= 3
),
cnt AS (SELECT g1 || ' ' || g2 || ' ' || g3 AS gram, count(*) AS cnt
        FROM tg GROUP BY 1),
rk AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, gram ASC) AS rk FROM cnt)
SELECT gram, cast(cnt AS BIGINT) AS cnt FROM rk WHERE rk <= {TRIGRAM_TOPN}
"""

ORACLES["bm25_explain"] = f"""{_SQL_BASE}
SELECT q.query_id, cast(tf.doc_id AS BIGINT) AS doc_id, tf.term,
       cast(tf.tf AS BIGINT) AS tf, cast(idf.df AS BIGINT) AS df,
       cast(round(idf.idf * 100000) AS BIGINT) AS idf_5dp,
       cast(round(q.qtf * idf.idf *
             (tf.tf * ({K1} + 1)) /
             (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) * 100000) AS BIGINT)
         AS term_score_5dp
FROM q
JOIN idf USING (term)
JOIN tf USING (term)
JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats s
WHERE q.query_id = '{EXPLAIN_QID}'
"""

ORACLES["maxscore_topk"] = _ORC1["bm25_topk"]

ORACLES["hybrid_linear_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
{_SQL_TFIDF_SCORED.lstrip()},
r1 AS (SELECT query_id, doc_id, round(score, 9) AS score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored),
r2 AS (SELECT query_id, doc_id, round(score, 9) AS score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM tscored),
n1 AS (SELECT query_id, doc_id,
              {W_LIN_BM25} * (CASE WHEN max(score) OVER (PARTITION BY query_id)
                                      = min(score) OVER (PARTITION BY query_id) THEN 1.0
                                   ELSE (score - min(score) OVER (PARTITION BY query_id))
                                      / (max(score) OVER (PARTITION BY query_id)
                                         - min(score) OVER (PARTITION BY query_id)) END) AS contrib
       FROM r1 WHERE rank <= {HYBRID_DEPTH}),
n2 AS (SELECT query_id, doc_id,
              {W_LIN_TFIDF} * (CASE WHEN max(score) OVER (PARTITION BY query_id)
                                       = min(score) OVER (PARTITION BY query_id) THEN 1.0
                                    ELSE (score - min(score) OVER (PARTITION BY query_id))
                                       / (max(score) OVER (PARTITION BY query_id)
                                          - min(score) OVER (PARTITION BY query_id)) END) AS contrib
       FROM r2 WHERE rank <= {HYBRID_DEPTH}),
fused AS (
  SELECT query_id, doc_id, round(sum(contrib), 9) AS score
  FROM (SELECT * FROM n1 UNION ALL SELECT * FROM n2)
  GROUP BY query_id, doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM fused)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""

ORACLES["rocchio_terms"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
{_SQL_TFIDF_SCORED.lstrip()},
fb AS (SELECT query_id, doc_id FROM (
         SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY round(score, 9) DESC, doc_id ASC) AS rk
         FROM scored) WHERE rk <= {ROCCHIO_FBK}),
neg AS (SELECT query_id, doc_id FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY round(score, 9) ASC, doc_id DESC) AS rk
          FROM scored) WHERE rk <= {ROCCHIO_NEGK}),
fbn AS (SELECT query_id, count(*) AS n_fb FROM fb GROUP BY query_id),
negn AS (SELECT query_id, count(*) AS n_fb FROM neg GROUP BY query_id),
wn AS (SELECT w.doc_id, w.term, w.w / norms.norm AS w_norm
       FROM w JOIN norms USING (doc_id)),
cpos AS (SELECT fb.query_id, wn.term,
                {ROCCHIO_BETA} * sum(wn.w_norm) / max(fbn.n_fb) AS fb_w
         FROM fb JOIN wn ON wn.doc_id = fb.doc_id
         JOIN fbn ON fbn.query_id = fb.query_id
         GROUP BY fb.query_id, wn.term),
cneg AS (SELECT neg.query_id, wn.term,
                -{ROCCHIO_GAMMA} * sum(wn.w_norm) / max(negn.n_fb) AS fb_w
         FROM neg JOIN wn ON wn.doc_id = neg.doc_id
         JOIN negn ON negn.query_id = neg.query_id
         GROUP BY neg.query_id, wn.term),
cent AS (SELECT query_id, term, sum(fb_w) AS fb_w
         FROM (SELECT * FROM cpos UNION ALL SELECT * FROM cneg)
         GROUP BY query_id, term),
qv AS (SELECT q.query_id, q.term, {ROCCHIO_ALPHA} * q.qtf * idf.idf AS q_w
       FROM q JOIN idf USING (term)),
mg AS (SELECT coalesce(qv.query_id, cent.query_id) AS query_id,
              coalesce(qv.term, cent.term) AS term,
              coalesce(qv.q_w, 0) AS q_w,
              round(greatest(0.0,
                    coalesce(qv.q_w, 0) + coalesce(cent.fb_w, 0)), 9) AS weight
       FROM qv FULL JOIN cent
         ON qv.query_id = cent.query_id AND qv.term = cent.term),
flt AS (SELECT * FROM mg WHERE weight >= {ROCCHIO_MINW}),
rkd AS (SELECT *,
               CASE WHEN q_w > 0 THEN 1 ELSE 0 END AS is_orig,
               sum(CASE WHEN q_w > 0 THEN 0 ELSE 1 END)
                 OVER (PARTITION BY query_id
                       ORDER BY weight DESC, term ASC
                       ROWS UNBOUNDED PRECEDING) AS exp_rank
        FROM flt)
SELECT query_id, term,
       cast(round(weight * 100000) AS BIGINT) AS weight_5dp
FROM rkd WHERE is_orig = 1 OR exp_rank <= {ROCCHIO_MAX}
"""

def _eval_run_oracle() -> str:
    from .entry_queries_ops import ORACLES as _ORC2

    return f"""
SELECT cast(count(*) AS BIGINT) AS n_queries,
       cast(round(avg(ap_5dp)) AS BIGINT) AS map_5dp,
       cast(round(avg(rr_5dp)) AS BIGINT) AS mrr_5dp,
       cast(round(avg(ndcg_5dp)) AS BIGINT) AS mean_ndcg_5dp,
       cast(round(avg(err_5dp)) AS BIGINT) AS mean_err_5dp,
       cast(round(avg(bpref_5dp)) AS BIGINT) AS mean_bpref_5dp,
       cast(round(exp(avg(ln(greatest(cast(ap_5dp AS DOUBLE), 1.0))))) AS BIGINT) AS gmap_5dp
FROM ({_ORC2["eval_metrics"]}) per_query
"""


ORACLES["compression_stats"] = f"""{_SQL_BASE.rstrip().rstrip(",")}
, tfdl AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl FROM tf JOIN dl USING (doc_id)),
ordd AS (SELECT term, doc_id // 16384 AS bk, doc_id, tf, dl,
                lag(doc_id) OVER (PARTITION BY term, doc_id // 16384
                                  ORDER BY doc_id) AS prev
         FROM tfdl),
pb AS (SELECT term, bk,
              CASE WHEN prev IS NULL THEN doc_id - bk * 16384
                   ELSE doc_id - prev END AS gap,
              tf, dl
       FROM ordd),
vb AS (SELECT term, bk,
              (CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
                    WHEN gap < 2097152 THEN 3 ELSE 4 END) +
              (CASE WHEN tf < 128 THEN 1 WHEN tf < 16384 THEN 2 ELSE 3 END) +
              (CASE WHEN dl < 128 THEN 1 WHEN dl < 16384 THEN 2 ELSE 3 END) AS nb
       FROM pb)
SELECT cast((SELECT count(*) FROM (SELECT DISTINCT term, bk FROM pb)) AS BIGINT) AS n_blocks,
       cast(count(*) AS BIGINT) AS n_postings,
       cast(sum(nb) AS BIGINT) AS enc_bytes,
       cast(round(sum(nb) / (12.0 * count(*)) * 100000) AS BIGINT) AS ratio_5dp
FROM vb
"""

ORACLES["bool_composite"] = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
fast_docs AS (SELECT DISTINCT doc_id FROM t WHERE list_contains(l, 'fast')),
sc_terms AS (
  SELECT term FROM (SELECT DISTINCT unnest(l) AS term FROM t)
  WHERE term LIKE 'sc%' ORDER BY term LIMIT 50
),
sc_docs AS (
  SELECT DISTINCT doc_id FROM t, sc_terms WHERE list_contains(t.l, sc_terms.term)
),
near_docs AS (
  SELECT doc_id FROM t
  WHERE len(list_filter(range(1, len(l) + 1),
        i -> l[i] = 'slow' AND
             len(list_filter(range(greatest(i - 3, 1), least(i + 3, len(l)) + 1),
                 j -> l[j] = 'value')) > 0)) > 0
),
not_src AS (SELECT doc_id FROM documents WHERE source <> 'src18'),
lhs AS (SELECT doc_id FROM fast_docs INTERSECT SELECT doc_id FROM sc_docs),
rhs AS (SELECT doc_id FROM near_docs INTERSECT SELECT doc_id FROM not_src)
SELECT cast(doc_id AS BIGINT) AS doc_id
FROM (SELECT doc_id FROM lhs UNION SELECT doc_id FROM rhs)
"""

ORACLES["embed_top_pairs"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_cosine_similarity(a.e, b.e) AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id),
rk AS (SELECT *, row_number() OVER (ORDER BY round(cosine, 9) DESC, ia ASC, ib ASC) AS rk FROM p)
SELECT cast(rk AS BIGINT) AS rank, cast(ia AS BIGINT) AS ia,
       cast(ib AS BIGINT) AS ib,
       cast(round(cosine * 100000) AS BIGINT) AS cosine_5dp
FROM rk WHERE rk <= {PAIRS_TOPN}
"""


def _embed_lsh_oracle() -> str:
    signs = _lsh_signs()
    vals = ", ".join(
        f"({p}, {d + 1}, {signs[d, p]:.1f})"
        for p in range(LSH_PLANES)
        for d in range(EMBED_DIM)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sv(p, d, s) AS (VALUES {vals}),
dots AS (
  SELECT v.vec_id, sv.p, round(sum(v.e[sv.d] * sv.s), 6) AS dot
  FROM v CROSS JOIN sv GROUP BY v.vec_id, sv.p
),
bk AS (SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS bucket
       FROM dots GROUP BY vec_id),
pr AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_cosine_similarity(va.e, vb.e) AS cosine
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
)
SELECT cast(ia AS BIGINT) AS ia, cast(ib AS BIGINT) AS ib,
       cast(round(cosine * 100000) AS BIGINT) AS cosine_5dp
FROM pr WHERE round(cosine, 9) > 0
"""


ORACLES["embed_lsh_pairs"] = _embed_lsh_oracle()


def _fingerprint_oracle() -> str:
    from .ops.textstats import FP_BASE, FP_K, FP_MOD

    powers = [FP_BASE ** (FP_K - 1 - l) for l in range(FP_K)]
    terms = " + ".join(
        f"(ascii(substr(text, j + {l}, 1)) % 256) * {powers[l]}::BIGINT"
        for l in range(FP_K)
    )
    return f"""
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(CASE
         WHEN length(text) >= {FP_K} THEN
           list_min(list_transform(range(1, length(text) - {FP_K - 2}),
                    j -> ({terms}) % {FP_MOD}))
         WHEN length(text) > 0 THEN
           list_sum(list_transform(range(1, length(text) + 1),
                    j -> (ascii(substr(text, j, 1)) % 256)::BIGINT))
         ELSE 0 END AS BIGINT) AS fingerprint
FROM documents
"""


ORACLES["doc_fingerprints"] = _fingerprint_oracle()

N_MEDIA, MEDIA_SEED, MEDIA_DIM = 128, 42, 16


def _media_oracle() -> str:
    # payload byte i = (mid·131 + i·7919 + seed) % 256; numpy array_split
    # stripe s covers [s·base + min(s, rem), +base + (s<rem)); stripe means
    # quantize through FLOAT exactly like the stub's float32 cast
    return f"""
WITH m AS (SELECT unnest(range(0, {N_MEDIA})) AS mid),
base AS (
  SELECT mid,
         CASE mid % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         (mid * 2654435761 + {MEDIA_SEED}) % 4096 + 64 AS n
  FROM m
),
feat AS (
  SELECT mid, kind, n,
         list_sum(list_transform(range(0, {MEDIA_DIM}), s ->
           CAST(CAST(
             list_sum(list_transform(
               range(s * (n // {MEDIA_DIM}) + least(s, n % {MEDIA_DIM}),
                     s * (n // {MEDIA_DIM}) + least(s, n % {MEDIA_DIM})
                       + (n // {MEDIA_DIM}) + CASE WHEN s < n % {MEDIA_DIM} THEN 1 ELSE 0 END),
               i -> (mid * 131 + i * 7919 + {MEDIA_SEED}) % 256)) * 1.0
             / ((n // {MEDIA_DIM}) + CASE WHEN s < n % {MEDIA_DIM} THEN 1 ELSE 0 END)
           AS FLOAT) AS DOUBLE))) AS fsum
  FROM base
)
SELECT cast(mid AS BIGINT) AS media_id, kind, cast(n AS BIGINT) AS n_bytes,
       cast(round(fsum * 100000) AS BIGINT) AS feat_sum_5dp
FROM feat
"""


ORACLES["media_features"] = _media_oracle()

# synth_media: kind = mid % 3 (2 → video), duration_ms = 1000 + mid % 60000
ORACLES["frame_offsets"] = f"""
WITH m AS (SELECT unnest(range(0, {N_MEDIA})) AS mid),
vids AS (
  SELECT mid, 1000 + mid % 60000 AS duration_ms FROM m WHERE mid % 3 = 2
)
SELECT CAST(mid AS BIGINT) AS media_id,
       CAST(unnest(range(0, duration_ms + 1, {FRAME_EVERY_MS})) AS BIGINT) AS frame_ms
FROM vids
"""

ORACLES["eval_run"] = _eval_run_oracle()


def registry() -> dict:
    return {
        "eval_run": q_eval_run,
        "compression_stats": q_compression_stats,
        "facet_counts": q_facet_counts,
        "field_bm25_topk": q_field_bm25_topk,
        "date_range_events": q_date_range_events,
        "lang_id_counts": q_lang_id_counts,
        "snippet_kwic": q_snippet_kwic,
        "window_docs": q_window_docs,
        "colloc_pmi": q_colloc_pmi,
        "trigram_top": q_trigram_top,
        "bm25_explain": q_bm25_explain,
        "maxscore_topk": q_maxscore_topk,
        "hybrid_linear_topk": q_hybrid_linear_topk,
        "bool_composite": q_bool_composite,
        "rocchio_terms": q_rocchio_terms,
        "embed_top_pairs": q_embed_top_pairs,
        "embed_lsh_pairs": q_embed_lsh_pairs,
        "doc_fingerprints": q_doc_fingerprints,
        "media_features": q_media_features,
        "frame_offsets": q_frame_offsets,
    }
