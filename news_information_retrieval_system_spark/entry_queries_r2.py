"""Driver-contract registry, batch 4 (round 2): field-boost rerank (Q22),
the real snippet/KWIC module (Q26), end-to-end incremental add (B2),
BIM with relevance feedback (Q17), LM smoothing variants (Q16),
CombMNZ / z-score hybrid fusion (Q21), field-phrase + stopword-filtered
build (Q11/T5).

Reference parity targets (SURVEY.md §2): Q22 field boost
(src/ir_app/services/search_service.py:434-481, applied at :157 to every
model), Q26 best-sentence snippet + highlight + KWIC
(search_service.py:627-703, src/ir/summarize/dynamic.py:100-472), B2
incremental add (src/ir/index/inverted_index.py:171-258,
incremental_builder.py:180-315), Q17 RSJ feedback weights
(src/ir/retrieval/bim.py:209-284), Q16 absolute discounting + KL
(language_model_retrieval.py:270-302,415-455), Q21 combmnz/zscore
(src/ir/ranking/hybrid.py:241-433), field:"phrase" (boolean.py:603-628),
build-time stopword filter (incremental_builder.py:111-128).

Same discipline as the other batches: constants shared between the Spark
code and the generated DuckDB SQL, ranks on 9dp-rounded scores, floats
exported as *_5dp bigints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import (
    _docs,
    _index,
    _qterms,
    _INDEX_CACHE,
    _SQL_BASE,
    _SQL_BM25_SCORED,
    _SQL_TFIDF_SCORED,
    B,
    K1,
    TOPK,
)
from .query.bm25 import score_bm25, topk
from .query.vsm import score_tfidf

# ----------------------------------------------------------------- fixtures
FB_DEPTH = 50
FB_WEIGHTS = {"title": 0.45, "tags": 0.25, "content": 0.06}
FB_HITS_CAP, FB_CAP = 3, 1.5
TITLE_TOKENS, TAG_TOKENS = 6, 2  # derived title = tokens 1..6, tags = 7..8
SNIPPET_QUERY = "fast scan value"
SENT1, SENT2 = 15, 15  # sentence 1 = tokens 1..15, sentence 2 = 16..30
SNIPPET_MAX = 180
KWIC_WINDOW = 5
INC_HOLDOUT = 10  # docs with doc_id % 10 == 0 arrive as the second segment
FB_REL_MOD = 7  # synthetic feedback: docs with doc_id % 7 == 1 are "relevant"
LM_DELTA = 0.7  # absolute-discounting δ (reference default delta=0.7)
LM_JM_LAMBDA = 0.7
STOPWORDS_BUILD = ("the", "a", "of", "to", "and")


def _e5(col: str, name: str):
    return F.round(F.col(col) * 100000).cast("long").alias(name)


def _rank_out(scored: DataFrame, k: int = TOPK) -> DataFrame:
    scored = scored.withColumn("score", F.round("score", 9))
    return topk(scored, k=k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5("score", "score_5dp"),
    )


# ------------------------------------------------------------- Q22 fieldboost
def _field_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with derived field columns: title = first TITLE_TOKENS
    tokens, tags = the next TAG_TOKENS tokens (array), content = full text.
    Derivations are token-slice-exact so the DuckDB oracle reproduces them."""
    from .tokenize import tokens_col

    d = _docs(spark, sf_dir)
    t = tokens_col("text")
    return d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(t, 1, TITLE_TOKENS)).alias("title"),
        F.slice(t, TITLE_TOKENS + 1, TAG_TOKENS).alias("tags"),
        F.col("text").alias("content"),
    )


def q_fieldboost_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: BM25 depth-FB_DEPTH ranking reranked with the reference's
    additive field boost Σ_field w·min(unique hits, 3) capped at 1.5
    (search_service.py:434-481), then re-sorted."""
    from .query.fieldboost import field_boost_rerank

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    base = topk(
        score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)),
        k=FB_DEPTH,
    ).select("query_id", "doc_id", "score")
    out = field_boost_rerank(base, _field_docs(spark, sf_dir), q, FB_WEIGHTS)
    return _rank_out(out)


# ------------------------------------------------------------- Q26 snippets
def _sentenced_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived corpus with sentence punctuation: three token-slice
    sentences joined by '. ' — gives the best-sentence selector real work
    while staying reproducible in SQL from the same token slices."""
    from .tokenize import tokens_col

    d = _docs(spark, sf_dir)
    t = tokens_col("text")
    s1 = F.concat_ws(" ", F.slice(t, 1, SENT1))
    s2 = F.concat_ws(" ", F.slice(t, SENT1 + 1, SENT2))
    s3 = F.concat_ws(
        " ", F.slice(t, SENT1 + SENT2 + 1, F.greatest(F.size(t) - (SENT1 + SENT2), F.lit(0)))
    )
    return d.filter(F.size(t) >= 1).select(
        "doc_id",
        F.concat(s1, F.lit(". "), s2, F.lit(". "), s3).alias("text"),
    )


def q_snippet_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26 via the real snippet module (query/snippet.py): best sentence by
    unique query-term hits (first wins ties), 180-char trim, <mark>
    highlighting, plus the KWIC line count for the same query."""
    from .query.snippet import kwic_lines, with_snippets

    d = _sentenced_docs(spark, sf_dir).withColumn(
        "query_text", F.lit(SNIPPET_QUERY)
    )
    out = with_snippets(d, "query_text", "text")
    out = kwic_lines(out, "query_text", "text", window=KWIC_WINDOW)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "snippet",
        F.size("kwic").cast("long").alias("n_kwic"),
    )


# ------------------------------------------------------- B2 incremental add
def q_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 end-to-end: build a blocked index on 90% of the corpus, append
    the held-out docs as a second segment via the shuffle-aware
    merge_segments, re-derive df/idf/dl/avgdl from the merged blocks, and
    run the BM25 batch — results must equal the full-corpus build, so this
    registers against the bm25_topk oracle (append ≡ rebuild).
    Reference semantics: add_documents_batch + finalize
    (src/ir/index/incremental_builder.py:180-315,456-470)."""
    from .index.build import build_index
    from .index.segments import (
        build_blocked_postings,
        index_from_blocks,
        merge_segments,
    )

    key = ("incremental", id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        d = _docs(spark, sf_dir)
        base = build_index(d.filter(F.col("doc_id") % INC_HOLDOUT != 0))
        extra = build_index(d.filter(F.col("doc_id") % INC_HOLDOUT == 0))
        seg1 = build_blocked_postings(base.postings, term_dict=base.term_stats)
        seg2 = build_blocked_postings(extra.postings, term_dict=extra.term_stats)
        merged = merge_segments(seg1.unionByName(seg2))
        idx = index_from_blocks(merged, d)  # finalize(): re-derive stats
        idx.persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    return _rank_out(score_bm25(idx, _qterms(spark), k1=K1, b=B))


# ---------------------------------------------------------- Q17 BIM feedback
def q_bim_fb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 with relevance feedback: RSJ weights pi=(ri+0.5)/(R+1),
    qi=(df-ri+0.5)/(N-R+1), w=ln(pi(1-qi)/((1-pi)qi))
    (src/ir/retrieval/bim.py:209-284). Synthetic feedback set derivable in
    SQL: docs with doc_id % FB_REL_MOD == 1."""
    from .query.bim import score_bim_feedback

    idx = _index(spark, sf_dir)
    rel = _docs(spark, sf_dir).filter(
        F.col("doc_id") % FB_REL_MOD == 1
    ).select("doc_id")
    return _rank_out(score_bim_feedback(idx, _qterms(spark), rel))


# ------------------------------------------------------- Q16 LM variants
def q_lm_absdisc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 absolute discounting: p(t|D) = max(tf-δ,0)/dl + α·p(t|C),
    α = δ·|unique terms in D|/dl (language_model_retrieval.py:270-302)."""
    from .query.lm import score_lm_absdisc

    return _rank_out(score_lm_absdisc(_index(spark, sf_dir), _qterms(spark), delta=LM_DELTA))


def q_lm_jm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 Jelinek-Mercer: p = λ·tf/dl + (1-λ)·p_c (reference λ=0.7)."""
    from .query.lm import score_lm

    return _rank_out(score_lm(_index(spark, sf_dir), _qterms(spark), lam=LM_JM_LAMBDA))


def q_lm_kl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 KL-divergence scoring: -KL(Q||D) with MLE query model over
    Dirichlet-smoothed doc model (language_model_retrieval.py:415-455)."""
    from .query.lm import score_lm_kl

    return _rank_out(score_lm_kl(_index(spark, sf_dir), _qterms(spark), mu=2000.0))


# ------------------------------------------------------- Q21 fusion variants
def q_hybrid_combmnz_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 CombMNZ (minmax-normalized): (Σ w·norm) × #matching rankers
    (src/ir/ranking/hybrid.py:389-433)."""
    from .query.hybrid import combmnz_fuse

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    r1 = topk(score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)), k=FB_DEPTH)
    r2 = topk(score_tfidf(idx, q).withColumn("score", F.round("score", 9)), k=FB_DEPTH)
    fused = combmnz_fuse([(r1, 0.65), (r2, 0.35)], normalization="minmax")
    return _rank_out(fused)


def q_hybrid_zscore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 linear fusion under z-score normalization
    (src/ir/ranking/hybrid.py:271-283)."""
    from .query.hybrid import zscore_linear_fuse

    idx = _index(spark, sf_dir)
    q = _qterms(spark)
    r1 = topk(score_bm25(idx, q, k1=K1, b=B).withColumn("score", F.round("score", 9)), k=FB_DEPTH)
    r2 = topk(score_tfidf(idx, q).withColumn("score", F.round("score", 9)), k=FB_DEPTH)
    fused = zscore_linear_fuse([(r1, 0.65), (r2, 0.35)])
    return _rank_out(fused)


# --------------------------------------------------------- B14 keywords
KW_K, KW_DOCS = 5, 100


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: top-5 TF-IDF keywords per doc (first KW_DOCS docs) — the
    PAT-tree keyword-extraction parity op (tfidf scoring)."""
    from .query.vsm import doc_keywords

    idx = _index(spark, sf_dir)
    out = doc_keywords(idx, k=KW_K, rank_dp=9).filter(F.col("doc_id") < KW_DOCS)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.col("kw_rank").cast("long").alias("kw_rank"),
        _e5("w", "w_5dp"),
    )


# -------------------------------------------- Q11 field-phrase / T5 stopwords
FIELD_PHRASE_QUERY = 'slow AND text:"fast scan"'


def q_bool_field_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 field:"phrase": phrase tokens ANDed within the named field
    (reference boolean.py:603-628), composed with a plain term."""
    from .entry_queries_ops import _positional
    from .query.boolean import BooleanEngine

    eng = BooleanEngine(
        _index(spark, sf_dir), positional=_positional(spark, sf_dir)
    )
    return eng.query(FIELD_PHRASE_QUERY).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


def q_bm25_stopfilter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/B15: BM25 over an index built with filter_stopwords semantics
    (reference builds with filter_stopwords=True,
    incremental_builder.py:111-128)."""
    from .index.build import build_index

    key = ("stopfiltered", id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        idx = build_index(_docs(spark, sf_dir), stopwords=STOPWORDS_BUILD)
        idx.persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    q = _qterms(spark).filter(~F.col("term").isin(*STOPWORDS_BUILD))
    return _rank_out(score_bm25(idx, q, k1=K1, b=B))


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

_FB_TERMS = None  # filled from shared fixtures below


def _fieldboost_oracle() -> str:
    title_hi = TITLE_TOKENS
    tags_lo, tags_hi = TITLE_TOKENS + 1, TITLE_TOKENS + TAG_TOKENS
    return f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
base AS (SELECT query_id, doc_id, round(score, 9) AS score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY round(score, 9) DESC, doc_id ASC) AS rk
         FROM scored QUALIFY rk <= {FB_DEPTH}),
tl AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
ft AS (
  SELECT doc_id, 'title' AS fld, unnest(list_distinct(l[1:{title_hi}])) AS term FROM tl
  UNION ALL
  SELECT doc_id, 'tags', unnest(list_distinct(l[{tags_lo}:{tags_hi}])) FROM tl
  UNION ALL
  SELECT doc_id, 'content', unnest(list_distinct(l)) FROM tl
),
qd AS (SELECT DISTINCT query_id, term FROM q),
hits AS (SELECT qd.query_id, ft.doc_id, ft.fld, count(DISTINCT ft.term) AS h
         FROM ft JOIN qd USING (term) GROUP BY 1, 2, 3),
fb AS (SELECT query_id, doc_id,
              least(sum(CASE fld WHEN 'title' THEN {FB_WEIGHTS['title']}
                                 WHEN 'tags' THEN {FB_WEIGHTS['tags']}
                                 ELSE {FB_WEIGHTS['content']} END
                        * least(h, {FB_HITS_CAP})), {FB_CAP}) AS boost
       FROM hits GROUP BY 1, 2),
boosted AS (
  SELECT b.query_id, b.doc_id,
         round(b.score + coalesce(fb.boost, 0.0), 9) AS score
  FROM base b LEFT JOIN fb ON fb.query_id = b.query_id AND fb.doc_id = b.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM boosted)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""


ORACLES["fieldboost_topk"] = _fieldboost_oracle()


def _snippet_oracle() -> str:
    qts = sorted(set(SNIPPET_QUERY.split()))
    terms_in = ", ".join(f"'{t}'" for t in qts)
    # highlight alternation: longest-first like the module's sorted(key=len)
    alt = "|".join(sorted(set(SNIPPET_QUERY.split()), key=len, reverse=True))
    s1_hi = SENT1
    s2_lo, s2_hi = SENT1 + 1, SENT1 + SENT2
    s3_lo = SENT1 + SENT2 + 1
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1
),
seg AS (
  SELECT doc_id, l,
         array_to_string(l[1:{s1_hi}], ' ') AS s1,
         array_to_string(l[{s2_lo}:{s2_hi}], ' ') AS s2,
         array_to_string(l[{s3_lo}:len(l)], ' ') AS s3
  FROM tl
),
hits AS (
  SELECT doc_id, s1, s2, s3,
         len(list_filter(list_distinct(l[1:{s1_hi}]), x -> x IN ({terms_in}))) AS h1,
         CASE WHEN s2 = '' THEN -1
              ELSE len(list_filter(list_distinct(l[{s2_lo}:{s2_hi}]), x -> x IN ({terms_in}))) END AS h2,
         CASE WHEN s3 = '' THEN -1
              ELSE len(list_filter(list_distinct(l[{s3_lo}:len(l)]), x -> x IN ({terms_in}))) END AS h3,
         len(list_filter(l, x -> x IN ({terms_in}))) AS n_kwic
  FROM seg
),
best AS (
  SELECT doc_id, n_kwic,
         substr(CASE WHEN h1 >= h2 AND h1 >= h3 THEN s1
                     WHEN h2 >= h3 THEN s2
                     ELSE s3 END, 1, {SNIPPET_MAX}) AS sent
  FROM hits
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       regexp_replace(sent, '\\b({alt})\\b', '<mark>\\1</mark>', 'g') AS snippet,
       cast(n_kwic AS BIGINT) AS n_kwic
FROM best
"""


ORACLES["snippet_best"] = _snippet_oracle()

# append ≡ rebuild: the merged-segment index must reproduce the flat
# full-corpus BM25 ranking exactly
from .entry_queries import ORACLES as _ORC1  # noqa: E402

ORACLES["incremental_bm25"] = _ORC1["bm25_topk"]

ORACLES["bim_fb_topk"] = f"""{_SQL_BASE},
rel AS (SELECT doc_id FROM documents WHERE doc_id % {FB_REL_MOD} = 1),
relstats AS (SELECT cast(count(*) AS DOUBLE) AS r_tot FROM rel),
ri AS (SELECT tf.term, cast(count(*) AS DOUBLE) AS ri
       FROM tf JOIN rel USING (doc_id) GROUP BY tf.term),
wts AS (
  SELECT idf.term,
         ((coalesce(ri.ri, 0) + 0.5) / (rs.r_tot + 1)) AS pi,
         ((idf.df - coalesce(ri.ri, 0) + 0.5) / (s.n_docs - rs.r_tot + 1)) AS qi,
         idf.df, s.n_docs
  FROM idf CROSS JOIN stats s CROSS JOIN relstats rs
  LEFT JOIN ri ON ri.term = idf.term
),
w2 AS (
  SELECT term,
         CASE WHEN qi > 0 AND pi < 1
              THEN ln((pi * (1 - qi)) / ((1 - pi) * qi))
              ELSE ln((n_docs - df + 0.5) / (df + 0.5)) END AS w
  FROM wts
),
bscored AS (
  SELECT q.query_id, tf.doc_id, sum(w2.w) AS score
  FROM (SELECT DISTINCT query_id, term FROM q) q
  JOIN w2 USING (term)
  JOIN tf USING (term)
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

_LM_PRELUDE = f"""
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
tot AS (SELECT cast(sum(dl) AS DOUBLE) AS total_tokens FROM dl),
qcf AS (SELECT q.query_id, q.term, q.qtf, cf.cf / tot.total_tokens AS p_c
        FROM q JOIN cf USING (term) CROSS JOIN tot),
cand AS (SELECT DISTINCT qcf.query_id, tf.doc_id
         FROM qcf JOIN tf USING (term)),
uterms AS (SELECT doc_id, cast(count(*) AS DOUBLE) AS u FROM tf GROUP BY doc_id)
"""


def _lm_rank_tail() -> str:
    return f"""
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM lscored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""


ORACLES["lm_absdisc_topk"] = f"""{_SQL_BASE},
{_LM_PRELUDE},
lscored AS (
  SELECT cand.query_id, cand.doc_id,
         sum(qcf.qtf * ln(
             greatest(coalesce(tf.tf, 0) - {LM_DELTA}, 0) / dl.dl
             + ({LM_DELTA} * uterms.u / dl.dl) * qcf.p_c)) AS score
  FROM cand
  JOIN qcf ON qcf.query_id = cand.query_id
  JOIN dl ON dl.doc_id = cand.doc_id
  JOIN uterms ON uterms.doc_id = cand.doc_id
  LEFT JOIN tf ON tf.term = qcf.term AND tf.doc_id = cand.doc_id
  GROUP BY cand.query_id, cand.doc_id
),
{_lm_rank_tail().lstrip()}
"""

ORACLES["lm_jm_topk"] = f"""{_SQL_BASE},
{_LM_PRELUDE},
lscored AS (
  SELECT cand.query_id, cand.doc_id,
         sum(qcf.qtf * ln({LM_JM_LAMBDA} * coalesce(tf.tf, 0) / dl.dl
                          + (1 - {LM_JM_LAMBDA}) * qcf.p_c)) AS score
  FROM cand
  JOIN qcf ON qcf.query_id = cand.query_id
  JOIN dl ON dl.doc_id = cand.doc_id
  LEFT JOIN tf ON tf.term = qcf.term AND tf.doc_id = cand.doc_id
  GROUP BY cand.query_id, cand.doc_id
),
{_lm_rank_tail().lstrip()}
"""

# KL(Q||D) with MLE query model p_q = qtf/|Q|; score = -Σ p_q ln(p_q/p_d),
# p_d Dirichlet-smoothed (μ=2000)
ORACLES["lm_kl_topk"] = f"""{_SQL_BASE},
{_LM_PRELUDE},
qlen AS (SELECT query_id, cast(sum(qtf) AS DOUBLE) AS qlen FROM q GROUP BY query_id),
lscored AS (
  SELECT cand.query_id, cand.doc_id,
         -sum((qcf.qtf / qlen.qlen) *
              ln((qcf.qtf / qlen.qlen) /
                 ((coalesce(tf.tf, 0) + 2000.0 * qcf.p_c) / (dl.dl + 2000.0)))) AS score
  FROM cand
  JOIN qcf ON qcf.query_id = cand.query_id
  JOIN qlen ON qlen.query_id = cand.query_id
  JOIN dl ON dl.doc_id = cand.doc_id
  LEFT JOIN tf ON tf.term = qcf.term AND tf.doc_id = cand.doc_id
  GROUP BY cand.query_id, cand.doc_id
),
{_lm_rank_tail().lstrip()}
"""


def _fusion_oracle(kind: str) -> str:
    if kind == "combmnz":
        norm = (
            "CASE WHEN mx = mn THEN 1.0 ELSE (score - mn) / (mx - mn) END"
        )
        stats = "min(score) OVER (PARTITION BY query_id) AS mn, max(score) OVER (PARTITION BY query_id) AS mx"
        agg = "round(sum(contrib) * sum(is_match), 9) AS score"
    else:  # zscore
        norm = "CASE WHEN sd = 0 THEN 0.0 ELSE (score - mu) / sd END"
        stats = "avg(score) OVER (PARTITION BY query_id) AS mu, stddev_pop(score) OVER (PARTITION BY query_id) AS sd"
        agg = "round(sum(contrib), 9) AS score"
    return f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
{_SQL_TFIDF_SCORED.lstrip()},
r1 AS (SELECT query_id, doc_id, round(score, 9) AS score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored QUALIFY rank <= {FB_DEPTH}),
r2 AS (SELECT query_id, doc_id, round(score, 9) AS score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM tscored QUALIFY rank <= {FB_DEPTH}),
n1 AS (SELECT query_id, doc_id, {norm} AS nscore
       FROM (SELECT query_id, doc_id, score, {stats} FROM r1)),
n2 AS (SELECT query_id, doc_id, {norm} AS nscore
       FROM (SELECT query_id, doc_id, score, {stats} FROM r2)),
uni AS (
  SELECT query_id, doc_id, 0.65 * nscore AS contrib,
         CASE WHEN nscore > 0 THEN 1 ELSE 0 END AS is_match FROM n1
  UNION ALL
  SELECT query_id, doc_id, 0.35 * nscore,
         CASE WHEN nscore > 0 THEN 1 ELSE 0 END FROM n2
),
fused AS (SELECT query_id, doc_id, {agg} FROM uni GROUP BY query_id, doc_id),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM fused)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""


ORACLES["hybrid_combmnz_topk"] = _fusion_oracle("combmnz")
ORACLES["hybrid_zscore_topk"] = _fusion_oracle("zscore")

ORACLES["doc_keywords"] = f"""{_SQL_BASE}
SELECT doc_id, term, kw_rank, w_5dp FROM (
  SELECT cast(tf.doc_id AS BIGINT) AS doc_id, tf.term,
         cast(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round((1 + log10(tf.tf)) * idf.idf, 9) DESC, tf.term ASC
         ) AS BIGINT) AS kw_rank,
         cast(round((1 + log10(tf.tf)) * idf.idf * 100000) AS BIGINT) AS w_5dp
  FROM tf JOIN idf USING (term)
  WHERE tf.doc_id < {KW_DOCS}
) WHERE kw_rank <= {KW_K}
"""

ORACLES["bool_field_phrase"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)
SELECT cast(doc_id AS BIGINT) AS doc_id FROM t
WHERE list_contains(l, 'slow')
  AND list_contains(l, 'fast')
  AND list_contains(l, 'scan')
"""

_SW_BUILD_IN = ", ".join(f"'{w}'" for w in STOPWORDS_BUILD)
ORACLES["bm25_stopfilter_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                        x -> x <> '' AND x NOT IN ({_SW_BUILD_IN}))) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id,
              len(list_filter(string_split(text, ' '),
                  x -> x <> '' AND x NOT IN ({_SW_BUILD_IN}))) AS dl
       FROM documents),
stats AS (SELECT cast(count(*) AS DOUBLE) AS n_docs,
                 sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
df AS (SELECT term, cast(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (SELECT term, df, ln(1 + (s.n_docs - df + 0.5)/(df + 0.5)) AS idf
        FROM df CROSS JOIN stats s),
{{QTERMS}},
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
  WHERE q.term NOT IN ({_SW_BUILD_IN})
  GROUP BY q.query_id, tf.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored)
SELECT query_id, cast(rank AS BIGINT) AS rank, cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp
FROM rk WHERE rank <= {TOPK}
"""


def _finalize_stopfilter_oracle() -> None:
    from .entry_queries import _qterms_values_sql

    ORACLES["bm25_stopfilter_topk"] = ORACLES["bm25_stopfilter_topk"].replace(
        "{QTERMS}", _qterms_values_sql()
    )


_finalize_stopfilter_oracle()


def registry() -> dict:
    return {
        "fieldboost_topk": q_fieldboost_topk,
        "snippet_best": q_snippet_best,
        "incremental_bm25": q_incremental_bm25,
        "bim_fb_topk": q_bim_fb_topk,
        "lm_absdisc_topk": q_lm_absdisc_topk,
        "lm_jm_topk": q_lm_jm_topk,
        "lm_kl_topk": q_lm_kl_topk,
        "hybrid_combmnz_topk": q_hybrid_combmnz_topk,
        "hybrid_zscore_topk": q_hybrid_zscore_topk,
        "bool_field_phrase": q_bool_field_phrase,
        "bm25_stopfilter_topk": q_bm25_stopfilter_topk,
        "doc_keywords": q_doc_keywords,
    }
