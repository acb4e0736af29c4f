"""Round-4 (session 4) driver-contract entries.

* tiered_topk — tiered impact-ordered retrieval with per-query adaptive
  fallback (query/tiered.py, Manning IR §7.2.1); the oracle re-derives
  impact ranking, tier bucketing, per-query cumulative candidate counts,
  the chosen tier, and the stored-impact scoring from first principles.
* rerank2_topk — two-phase retrieve-then-rerank (query/rerank.py): BM25
  top-``RR_K_CAND`` pool rescored by a pinned linear model over the LTR
  feature row; the oracle re-derives candidates + every feature + the
  linear rescore (the ltr_features CTE chain with the model applied).
* incr_dedup_flags / incr_simhash_hits — incremental cross-snapshot
  dedup (ops/incr_dedup.py, reference DuplicateDetector semantics,
  deduplication.py:204-298): the corpus/batch split and the planted
  duplicates are derived from the documents table by shared mod
  arithmetic, so both engines build identical inputs; the exact oracle
  re-derives md5 flags + first-seen windows, the fuzzy oracle recomputes
  md5-bit SimHash fingerprints from scratch and brute-forces the
  batch×corpus Hamming scan the banded pipeline must reproduce.

Constants live here so the Spark entries and the SQL oracles cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import (
    _SQL_BASE,
    _SQL_BM25_SCORED,
    B,
    K1,
    MU,
    TOPK,
    _docs,
    _e5,
    _index,
    _qterms,
)

# ------------------------------------------------------------ tiered index
# depth ladder: tier 1 prunes hard (4 docs/term), tier 3 caps at 256 —
# below the hottest df at sf0.01, so even the deepest tier is a true
# static prune and per-query fallback actually varies across the set.
TD_DEPTHS = (4, 32, 256)


def q_tiered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.tiered import build_tiered_lists, tiered_topk

    t = build_tiered_lists(_index(spark, sf_dir), depths=TD_DEPTHS, k1=K1, b=B)
    out = tiered_topk(t, _qterms(spark), k=TOPK)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5(),
        F.col("tier").cast("long").alias("tier"),
    )


# --------------------------------------------------------------- rerank
# Pinned production-style weights (the trained ltr_train artifact drops
# in): mostly-BM25 with LM/TF-IDF confirmation, a small completeness
# bonus, and a mild length prior. k_cand=30 makes phase 2 a genuine
# re-rank of a 3× pool, not a pass-through.
RR_K_CAND = 30
RR_INTERCEPT = 0.1
RR_W = {
    "bm25_score": 0.6,
    "lm_score": 0.25,
    "tfidf_score": 0.1,
    "match_count": 0.05,
    "dl": -0.0005,
}


def q_rerank2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query.rerank import rerank_topk

    out = rerank_topk(
        _index(spark, sf_dir), _qterms(spark), weights=RR_W,
        intercept=RR_INTERCEPT, k_cand=RR_K_CAND, k=TOPK, k1=K1, b=B, mu=MU,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5(),
        F.col("phase1_rank").cast("long").alias("phase1_rank"),
    )


# ------------------------------------------- incremental dedup fixtures
# corpus = doc_id % 3 != 0 (text as-is); batch = doc_id % 3 == 0 with
# planted duplicates: % 15 == 0 rows copy their successor's text (a
# corpus doc — doc_id+1 ≢ 0 mod 3), % 15 == 6 rows collapse onto 4
# shared payloads (in-batch duplicate groups). Both engines derive the
# split from the same mod arithmetic.
ID_BATCH_MOD = 3
ID_COPY_MOD, ID_GROUP_MOD, ID_GROUP_REM = 15, 15, 6


def _id_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).filter(
        F.col("doc_id") % ID_BATCH_MOD != 0
    ).select("doc_id", "text")


def _id_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    nb = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("ntext")
    )
    return (
        docs.filter(F.col("doc_id") % ID_BATCH_MOD == 0)
        .join(nb, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % ID_COPY_MOD == 0)
                & F.col("ntext").isNotNull(),
                F.col("ntext"),
            )
            .when(
                F.col("doc_id") % ID_GROUP_MOD == ID_GROUP_REM,
                F.concat(
                    F.lit("planted batch dup "),
                    (F.col("doc_id") % 4).cast("string"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )


_ID_SQL_TABLES = f"""
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % {ID_BATCH_MOD} <> 0),
nb AS (SELECT doc_id - 1 AS doc_id, text AS ntext FROM documents),
batch AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {ID_COPY_MOD} = 0 AND nb.ntext IS NOT NULL
                THEN nb.ntext
              WHEN d.doc_id % {ID_GROUP_MOD} = {ID_GROUP_REM}
                THEN 'planted batch dup ' || (d.doc_id % 4)::VARCHAR
              ELSE d.text END AS text
  FROM documents d LEFT JOIN nb USING (doc_id)
  WHERE d.doc_id % {ID_BATCH_MOD} = 0
)"""


def q_incr_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.incr_dedup import corpus_hash_state, incremental_exact_dedup

    state = corpus_hash_state(_id_corpus(spark, sf_dir))
    out = incremental_exact_dedup(_id_batch(spark, sf_dir), state)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "content_hash",
        F.col("dup_of_corpus").cast("long").alias("dup_of_corpus"),
        F.col("dup_in_batch").cast("long").alias("dup_in_batch"),
        F.col("kept").cast("long").alias("kept"),
    )


# fuzzy: 16 four-bit bands cover the reported Hamming ≤ 15 by pigeonhole.
# NOTE (ADVICE r4): 4-bit band keys mean only 16 buckets per band, so the
# banded candidate join degenerates toward batch×corpus as the corpus grows
# — this permissive threshold is a small-sf ORACLE fixture (it makes the
# exact cross-Hamming DuckDB re-derivation cover the full candidate set);
# production callers should keep the default hamming=3/bands=4 (16-bit
# keys), where banding genuinely prunes.
ID_SH_HAMMING, ID_SH_BANDS = 15, 16


def q_incr_simhash_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import md5_hash64_col
    from .ops.incr_dedup import (
        corpus_simhash_state,
        incremental_simhash_dedup,
    )

    fps = corpus_simhash_state(
        _id_corpus(spark, sf_dir), hash_fn=md5_hash64_col
    )
    out = incremental_simhash_dedup(
        _id_batch(spark, sf_dir), fps,
        hamming=ID_SH_HAMMING, bands=ID_SH_BANDS, hash_fn=md5_hash64_col,
    )
    return out.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.col("corpus_id").cast("long").alias("corpus_id"),
        F.col("hamming_dist").cast("long").alias("hamming_dist"),
    )


# ----------------------------------------------------------------- oracles
ORACLES: dict[str, str] = {}

_d1, _d2, _d3 = TD_DEPTHS
ORACLES["tiered_topk"] = f"""{_SQL_BASE},
imp AS (
  SELECT tf.term, tf.doc_id,
         round(idf.idf * (tf.tf * ({K1} + 1)) /
               (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)), 9) AS impact
  FROM tf JOIN idf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
),
trd AS (
  SELECT term, doc_id, impact,
         CASE WHEN cr <= {_d1} THEN 1
              WHEN cr <= {_d2} THEN 2
              ELSE 3 END AS tier
  FROM (SELECT term, doc_id, impact,
               row_number() OVER (PARTITION BY term
                                  ORDER BY impact DESC, doc_id ASC) AS cr
        FROM imp)
  WHERE cr <= {_d3}
),
hits AS (SELECT q.query_id, q.qtf, t.doc_id, t.impact, t.tier
         FROM q JOIN trd t USING (term)),
cand AS (SELECT query_id, doc_id, min(tier) AS first_tier
         FROM hits GROUP BY query_id, doc_id),
cum AS (SELECT query_id, first_tier,
               sum(count(*)) OVER (PARTITION BY query_id
                                   ORDER BY first_tier) AS cum
        FROM cand GROUP BY query_id, first_tier),
chosen AS (SELECT query_id,
                  coalesce(min(CASE WHEN cum >= {TOPK} THEN first_tier END),
                           max(first_tier)) AS tier
           FROM cum GROUP BY query_id),
scored AS (
  SELECT h.query_id, h.doc_id, ch.tier,
         round(sum(h.qtf * h.impact), 9) AS score
  FROM hits h JOIN chosen ch USING (query_id)
  WHERE h.tier <= ch.tier
  GROUP BY h.query_id, h.doc_id, ch.tier
),
rk AS (SELECT query_id, doc_id, tier, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC)
                AS rank
       FROM scored)
SELECT query_id, cast(rank AS BIGINT) AS rank,
       cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp,
       cast(tier AS BIGINT) AS tier
FROM rk WHERE rank <= {TOPK}"""


def _rerank_oracle() -> str:
    w = RR_W
    return f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
cand AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC)
             AS rank
    FROM scored) WHERE rank <= {RR_K_CAND}
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
  SELECT query_id, doc_id, max(rank) AS phase1_rank,
         sum(qtf) AS qtc,
         count(CASE WHEN tf > 0 THEN 1 END) AS match_count,
         max(dl) AS dl,
         sum(qtf * idf * (tf * ({K1} + 1)) /
             (tf + {K1} * (1 - {B} + {B} * dl / avgdl))) AS bm25,
         sum(qtf * idf * w_norm) AS tfidf,
         sum(qtf * ln((tf + {MU} * p_c) / (dl + {MU}))) AS lm
  FROM base GROUP BY query_id, doc_id
),
rescored AS (
  SELECT query_id, doc_id, phase1_rank,
         round({RR_INTERCEPT}
               + {w["bm25_score"]} * bm25
               + {w["dl"]} * dl
               + {w["lm_score"]} * lm
               + {w["match_count"]} * match_count
               + {w["tfidf_score"]} * tfidf, 9) AS score
  FROM agg
),
rk AS (SELECT query_id, doc_id, phase1_rank, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC, doc_id ASC)
                AS rank
       FROM rescored)
SELECT query_id, cast(rank AS BIGINT) AS rank,
       cast(doc_id AS BIGINT) AS doc_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp,
       cast(phase1_rank AS BIGINT) AS phase1_rank
FROM rk WHERE rank <= {TOPK}"""


ORACLES["rerank2_topk"] = _rerank_oracle()

ORACLES["incr_dedup_flags"] = f"""WITH {_ID_SQL_TABLES.strip()},
ch AS (SELECT doc_id, md5(text) AS content_hash FROM batch),
cs AS (SELECT DISTINCT md5(text) AS content_hash FROM corpus),
fl AS (
  SELECT ch.doc_id, ch.content_hash,
         CASE WHEN cs.content_hash IS NOT NULL THEN 1 ELSE 0 END
           AS dup_of_corpus,
         CASE WHEN row_number() OVER (PARTITION BY ch.content_hash
                                      ORDER BY ch.doc_id ASC) > 1
              THEN 1 ELSE 0 END AS dup_in_batch
  FROM ch LEFT JOIN cs USING (content_hash)
)
SELECT cast(doc_id AS BIGINT) AS doc_id, content_hash,
       cast(dup_of_corpus AS BIGINT) AS dup_of_corpus,
       cast(dup_in_batch AS BIGINT) AS dup_in_batch,
       cast(CASE WHEN dup_of_corpus = 0 AND dup_in_batch = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM fl"""

# fuzzy oracle: md5-bit SimHash from first principles over BOTH derived
# tables, brute-force batch×corpus Hamming — the banded+verified Spark
# pipeline must reproduce it exactly (precision AND completeness).
ORACLES["incr_simhash_hits"] = f"""WITH {_ID_SQL_TABLES.strip()},
sides AS (
  SELECT doc_id, text, 'b' AS side FROM batch
  UNION ALL
  SELECT doc_id, text, 'c' AS side FROM corpus
),
tf AS (SELECT side, doc_id, term, count(*) AS tf
       FROM (SELECT side, doc_id,
                    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS term
             FROM sides)
       GROUP BY side, doc_id, term),
th AS (SELECT DISTINCT term FROM tf),
bits AS (
  SELECT term, j,
         ((((strpos('0123456789abcdef', substr(md5(term), (j // 8) * 2 + 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(term), (j // 8) * 2 + 2, 1)) - 1))
           >> (j % 8)) & 1) AS bit
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
),
votes AS (
  SELECT tf.side, tf.doc_id, b.j,
         sum(CASE WHEN b.bit = 1 THEN tf.tf ELSE -tf.tf END) AS v
  FROM tf JOIN bits b USING (term)
  GROUP BY tf.side, tf.doc_id, b.j
),
fp AS (SELECT side, doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS fb
       FROM votes),
ham AS (
  SELECT bb.doc_id AS batch_id, cc.doc_id AS corpus_id,
         sum(CASE WHEN bb.fb <> cc.fb THEN 1 ELSE 0 END) AS hd
  FROM fp bb JOIN fp cc ON bb.j = cc.j
  WHERE bb.side = 'b' AND cc.side = 'c'
  GROUP BY bb.doc_id, cc.doc_id
)
SELECT cast(batch_id AS BIGINT) AS batch_id,
       cast(corpus_id AS BIGINT) AS corpus_id,
       cast(hd AS BIGINT) AS hamming_dist
FROM ham WHERE hd <= {ID_SH_HAMMING}"""


# ------------------------------------------- conversation-grain fixtures
# The driver's testdata has no transcripts table, so both engines derive
# the input_hint shape (conv_id, turn_idx, role, text, tool) from
# documents by the same arithmetic: 4 turns per conversation, alternating
# roles, a deterministic tool assignment, and a planted duplicate class —
# every conversation with (doc_id // 4) % 7 == 3 gets identical
# turn-texts, so whole-conversation dedup has real groups to find.
TR_TURNS = 4
TR_PLANT_MOD, TR_PLANT_REM = 7, 3
TR_CTX = 2  # sft_pairs context window (turns)
# ts fixture: epoch + 60s per turn + a 5s·(doc_id % 11) wobble, so
# inter-turn gaps vary (65s normally, 10s at the mod-11 wrap) but stay
# strictly positive — conversation_durations has real min/max spread.
TR_EPOCH = 1_700_000_000
TR_STEP, TR_WOBBLE_MOD, TR_WOBBLE = 60, 11, 5


def _tr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    cid = F.floor(F.col("doc_id") / TR_TURNS)
    return d.select(
        F.concat(F.lit("c"), cid.cast("string")).alias("conv_id"),
        (F.col("doc_id") % TR_TURNS).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.when(
            cid % TR_PLANT_MOD == TR_PLANT_REM,
            F.concat(
                F.lit("planted conv turn "),
                (F.col("doc_id") % TR_TURNS).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.col("doc_id") % 5 == 2, "search")
        .when(F.col("doc_id") % 5 == 4, "python")
        .otherwise("")
        .alias("tool"),
        F.timestamp_seconds(
            F.lit(TR_EPOCH)
            + F.col("doc_id") * TR_STEP
            + (F.col("doc_id") % TR_WOBBLE_MOD) * TR_WOBBLE
        ).alias("ts"),
    )


_TR_SQL = f"""tr AS (
  SELECT 'c' || (doc_id // {TR_TURNS})::VARCHAR AS conv_id,
         doc_id % {TR_TURNS} AS turn_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN (doc_id // {TR_TURNS}) % {TR_PLANT_MOD} = {TR_PLANT_REM}
              THEN 'planted conv turn ' || (doc_id % {TR_TURNS})::VARCHAR
              ELSE text END AS text,
         CASE WHEN doc_id % 5 = 2 THEN 'search'
              WHEN doc_id % 5 = 4 THEN 'python'
              ELSE '' END AS tool,
         to_timestamp({TR_EPOCH} + doc_id * {TR_STEP}
                      + (doc_id % {TR_WOBBLE_MOD}) * {TR_WOBBLE}) AS ts
  FROM documents
)"""


def q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import conversation_stats

    out = conversation_stats(_tr(spark, sf_dir))
    return out.select(
        "conv_id",
        *[
            F.col(c).cast("long").alias(c)
            for c in (
                "n_turns",
                "n_user",
                "n_assistant",
                "n_tool_calls",
                "n_distinct_tools",
                "total_tokens",
                "max_turn_idx",
            )
        ],
    )


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import sft_pairs

    out = sft_pairs(_tr(spark, sf_dir), context_turns=TR_CTX)
    return out.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "prompt",
        "response",
    )


def q_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import conversation_dedup

    out = conversation_dedup(_tr(spark, sf_dir))
    return out.select(
        "conv_id",
        "conv_hash",
        "canonical_conv_id",
        F.col("is_dup").cast("long").alias("is_dup"),
    )


ORACLES["conv_stats"] = f"""WITH {_TR_SQL}
SELECT conv_id,
       cast(count(*) AS BIGINT) AS n_turns,
       cast(count(CASE WHEN role = 'user' THEN 1 END) AS BIGINT) AS n_user,
       cast(count(CASE WHEN role = 'assistant' THEN 1 END) AS BIGINT)
         AS n_assistant,
       cast(count(CASE WHEN tool <> '' THEN 1 END) AS BIGINT)
         AS n_tool_calls,
       cast(count(DISTINCT CASE WHEN tool <> '' THEN tool END) AS BIGINT)
         AS n_distinct_tools,
       cast(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
         AS BIGINT) AS total_tokens,
       cast(max(turn_idx) AS BIGINT) AS max_turn_idx
FROM tr GROUP BY conv_id"""

ORACLES["sft_pairs"] = f"""WITH {_TR_SQL},
rend AS (SELECT conv_id, turn_idx, role, text,
                role || ': ' || text AS rendered
         FROM tr),
ctx AS (
  SELECT conv_id, turn_idx, role, text AS response,
         string_agg(rendered, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN {TR_CTX} PRECEDING AND 1 PRECEDING) AS prompt
  FROM rend
)
SELECT conv_id, cast(turn_idx AS BIGINT) AS turn_idx, prompt, response
FROM ctx
WHERE role = 'assistant' AND prompt IS NOT NULL AND prompt <> ''"""

# ------------------------------------- conversation-grain retrieval + ts
# Conversation retrieval scores RAW turn text (the planted-text rewrite
# in _tr is a dedup-only fixture feature), so it reuses the cached
# turn-grain index; the conversation is just the doc_id // TR_TURNS
# grouping both engines share.


def _conv_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("c"), F.floor(F.col("doc_id") / TR_TURNS).cast("string")
        ).alias("conv_id"),
    )


def _q_conv_rank(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    from .ops.transcripts import conversation_rank
    from .query.bm25 import score_bm25

    scores = score_bm25(_index(spark, sf_dir), _qterms(spark), k1=K1, b=B)
    out = conversation_rank(
        scores, _conv_map(spark, sf_dir), k=TOPK, method=method
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "conv_id",
        _e5(),
        F.col("n_matching_turns").cast("long").alias("n_matching_turns"),
    )


def q_conv_maxp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q_conv_rank(spark, sf_dir, "maxp")


def q_conv_sump_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q_conv_rank(spark, sf_dir, "sump")


def q_conv_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed conversation retrieval: score · 2^-(last - turn)
    per matching turn (ops/transcripts.py conversation_rank_decay). The
    halving weights are exact binary scalings, so the oracle reproduces
    every per-turn weighted score bit-identically; the cross-turn sum
    carries the same fp-order exposure as conv_sump_topk (5dp export)."""
    from .ops.transcripts import conversation_rank_decay
    from .query.bm25 import score_bm25

    scores = score_bm25(_index(spark, sf_dir), _qterms(spark), k1=K1, b=B)
    tmap = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("c"), F.floor(F.col("doc_id") / TR_TURNS).cast("string")
        ).alias("conv_id"),
        (F.col("doc_id") % TR_TURNS).cast("int").alias("turn_idx"),
    )
    out = conversation_rank_decay(scores, tmap, k=TOPK)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "conv_id",
        _e5(),
        F.col("n_matching_turns").cast("long").alias("n_matching_turns"),
    )


def q_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import tool_transitions

    out = tool_transitions(_tr(spark, sf_dir))
    return out.select(
        "prev_tool",
        "tool",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("n_conversations").cast("long").alias("n_conversations"),
    )


def q_conv_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import conversation_durations

    out = conversation_durations(_tr(spark, sf_dir))
    return out.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("duration_s").cast("long").alias("duration_s"),
        F.col("min_gap_s").cast("long").alias("min_gap_s"),
        F.col("max_gap_s").cast("long").alias("max_gap_s"),
    )


def q_turn_context_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.transcripts import turn_context
    from .query.bm25 import bm25_topk

    hits = bm25_topk(_index(spark, sf_dir), _qterms(spark), k=TOPK)
    raw_turns = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("c"), F.floor(F.col("doc_id") / TR_TURNS).cast("string")
        ).alias("conv_id"),
        (F.col("doc_id") % TR_TURNS).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        "text",
    )
    out = turn_context(raw_turns, hits, before=1, after=1)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _e5(),
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "context_before",
        "context_after",
    )


ORACLES["turn_context_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC,
                                          doc_id ASC) AS rank
       FROM scored),
trr AS (
  SELECT doc_id, 'c' || (doc_id // {TR_TURNS})::VARCHAR AS conv_id,
         doc_id % {TR_TURNS} AS turn_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
           || ': ' || text AS rendered
  FROM documents
),
ctx AS (
  SELECT doc_id, conv_id, turn_idx,
         coalesce(string_agg(rendered, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING), '')
           AS context_before,
         coalesce(string_agg(rendered, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING), '')
           AS context_after
  FROM trr
)
SELECT rk.query_id, cast(rk.rank AS BIGINT) AS rank,
       cast(rk.doc_id AS BIGINT) AS doc_id,
       cast(round(rk.score * 100000) AS BIGINT) AS score_5dp,
       ctx.conv_id, cast(ctx.turn_idx AS BIGINT) AS turn_idx,
       ctx.context_before, ctx.context_after
FROM rk JOIN ctx ON rk.doc_id = ctx.doc_id
WHERE rk.rank <= {TOPK}"""


def _conv_rank_sql(agg: str) -> str:
    return f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
conv AS (
  SELECT query_id, 'c' || (doc_id // {TR_TURNS})::VARCHAR AS conv_id,
         {agg}(score) AS score, count(*) AS n_matching_turns
  FROM scored GROUP BY query_id, conv_id
),
rk AS (SELECT query_id, conv_id, score, n_matching_turns,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC,
                                          conv_id ASC) AS rank
       FROM conv)
SELECT query_id, cast(rank AS BIGINT) AS rank, conv_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp,
       cast(n_matching_turns AS BIGINT) AS n_matching_turns
FROM rk WHERE rank <= {TOPK}"""


ORACLES["conv_maxp_topk"] = _conv_rank_sql("max")
ORACLES["conv_sump_topk"] = _conv_rank_sql("sum")

# recency decay: per-turn weight is an exact power-of-two scaling
# (bigint shift, clamped at 62 like the Spark path), so both engines
# compute identical per-turn doubles before the summed rollup
ORACLES["conv_decay_topk"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED},
tm AS (
  SELECT doc_id, 'c' || (doc_id // {TR_TURNS})::VARCHAR AS conv_id,
         doc_id % {TR_TURNS} AS turn_idx
  FROM documents
),
lastt AS (SELECT conv_id, max(turn_idx) AS last_idx FROM tm GROUP BY conv_id),
wtd AS (
  SELECT s.query_id, tm.conv_id,
         s.score / (1::BIGINT << least(lastt.last_idx - tm.turn_idx, 62))::DOUBLE
           AS wscore
  FROM scored s
  JOIN tm ON s.doc_id = tm.doc_id
  JOIN lastt ON tm.conv_id = lastt.conv_id
),
conv AS (
  SELECT query_id, conv_id, sum(wscore) AS score,
         count(*) AS n_matching_turns
  FROM wtd GROUP BY query_id, conv_id
),
rk AS (SELECT query_id, conv_id, score, n_matching_turns,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(score, 9) DESC,
                                          conv_id ASC) AS rank
       FROM conv)
SELECT query_id, cast(rank AS BIGINT) AS rank, conv_id,
       cast(round(score * 100000) AS BIGINT) AS score_5dp,
       cast(n_matching_turns AS BIGINT) AS n_matching_turns
FROM rk WHERE rank <= {TOPK}"""

ORACLES["tool_transitions"] = f"""WITH {_TR_SQL},
seq AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_tool
  FROM tr WHERE tool <> ''
)
SELECT prev_tool, tool,
       cast(count(*) AS BIGINT) AS n_transitions,
       cast(count(DISTINCT conv_id) AS BIGINT) AS n_conversations
FROM seq WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool"""

ORACLES["conv_durations"] = f"""WITH {_TR_SQL},
g AS (
  SELECT conv_id, cast(epoch(ts) AS BIGINT) AS es,
         cast(epoch(ts) AS BIGINT)
           - lag(cast(epoch(ts) AS BIGINT))
               OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s
  FROM tr
)
SELECT conv_id, cast(count(*) AS BIGINT) AS n_turns,
       cast(max(es) - min(es) AS BIGINT) AS duration_s,
       cast(min(gap_s) AS BIGINT) AS min_gap_s,
       cast(max(gap_s) AS BIGINT) AS max_gap_s
FROM g GROUP BY conv_id"""


# \\x1f/\\x1e unit separators mirror ops/transcripts.py FIELD_SEP/TURN_SEP
ORACLES["conv_dedup"] = f"""WITH {_TR_SQL},
fp AS (SELECT conv_id,
              md5(string_agg(role || chr(31) || text, chr(30)
                             ORDER BY turn_idx)) AS conv_hash
       FROM tr GROUP BY conv_id)
SELECT conv_id, conv_hash,
       min(conv_id) OVER (PARTITION BY conv_hash) AS canonical_conv_id,
       cast(CASE WHEN row_number() OVER (PARTITION BY conv_hash
                                         ORDER BY conv_id ASC) > 1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM fp"""


def registry():
    return {
        "tiered_topk": q_tiered_topk,
        "rerank2_topk": q_rerank2_topk,
        "incr_dedup_flags": q_incr_dedup_flags,
        "incr_simhash_hits": q_incr_simhash_hits,
        "conv_stats": q_conv_stats,
        "sft_pairs": q_sft_pairs,
        "conv_dedup": q_conv_dedup,
        "conv_maxp_topk": q_conv_maxp_topk,
        "conv_sump_topk": q_conv_sump_topk,
        "conv_decay_topk": q_conv_decay_topk,
        "tool_transitions": q_tool_transitions,
        "conv_durations": q_conv_durations,
        "turn_context_topk": q_turn_context_topk,
    }
