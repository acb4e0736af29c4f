"""Round-4 driver-contract entries: training-data curation operators.

These extend the engine beyond the reference's operator set with the
curation steps a 100 TB training-data pipeline runs (ops/curation.py):

* dataset_splits — deterministic md5-bucket train/val/test assignment;
  both engines recompute the bucket byte-for-byte, so the oracle checks
  the actual assignment (via per-split count + doc_id checksum), not
  just the split sizes.
* contamination_overlap — benchmark decontamination: distinct word
  trigrams shared with the benchmark subset (doc_id % 97 == 0), counted
  per candidate doc, thresholded. Broadcast semi-join plan — the
  benchmark dictionary is the only small side.
* pii_redacted — email scrub over a corpus with deterministically
  planted addresses (doc_id % 11 plants one, % 33 a second): match
  count + md5 of the redacted text per doc.
* token_length_histogram — power-of-two token-count buckets computed
  without floating-point logs (bit-length via base-2 string conv), so
  the bucket boundary can never drift between engines' log2 libms.

Both sides of every oracle derive fixtures from the same mod-class
arithmetic on doc_id — nothing to drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs
from .ops.curation import (
    EMAIL_RE,
    assign_splits,
    benchmark_contamination,
    pii_email_redact,
    token_length_buckets,
)

BENCH_MOD = 97
CONTAM_MIN_OVERLAP = 2
PII_MOD1, PII_MOD2 = 11, 33


# ------------------------------------------------------------------ splits
def q_dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = assign_splits(_docs(spark, sf_dir))
    return d.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


# --------------------------------------------------------- contamination
def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % BENCH_MOD == 0)
    cands = d.filter(F.col("doc_id") % BENCH_MOD != 0)
    ov = benchmark_contamination(cands, bench, k=3)
    return ov.filter(F.col("n_overlap") >= CONTAM_MIN_OVERLAP).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_overlap"
    )


# ------------------------------------------------------------------- PII
def _planted_pii(d: DataFrame) -> DataFrame:
    """Deterministically plant emails: doc_id%11==0 appends one address,
    doc_id%33==0 a second — so the oracle sees 0/1/2 matches per doc."""
    did = F.col("doc_id").cast("string")
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % PII_MOD1 == 0,
        F.concat(t, F.lit(" contact user"), did, F.lit("@example.com today")),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % PII_MOD2 == 0,
        F.concat(t, F.lit(" cc admin"), did, F.lit("@mail.example.org")),
    ).otherwise(t)
    return d.withColumn("text", t)


def q_pii_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pii_email_redact(_planted_pii(_docs(spark, sf_dir)))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_emails",
        F.md5("redacted").alias("redacted_md5"),
    )


# ------------------------------------------------------------ length hist
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_length_buckets(_docs(spark, sf_dir))


# ------------------------------------------------------- BPE-ish counting
def q_llm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import llm_token_count_col, token_count_col

    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count_col(F.col("text")).cast("long").alias("n_ws_tokens"),
        llm_token_count_col(F.col("text")).alias("n_bpe_tokens"),
    )


# ------------------------------------------------------------- repetition
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.curation import repetition_stats

    out = repetition_stats(_docs(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_bigrams",
        "distinct_bigrams",
        "dup_bigram_n",
        "top_bigram",
        "top_bigram_n",
    )


# ---------------------------------------------------------- split leakage
LEAK_MOD = 17
LEAK_OFFSET = 100000


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-copy leak detector over a corpus with planted cross-id
    duplicates (doc_id % 17 re-published under doc_id + 100000): because
    split assignment is content-independent (keyed on doc_id), the copies
    scatter across splits and must be flagged."""
    from .ops.curation import split_leakage

    d = _docs(spark, sf_dir)
    dup = d.filter(F.col("doc_id") % LEAK_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + LEAK_OFFSET
    )
    s = assign_splits(d.unionByName(dup))
    return split_leakage(s)


# ---------------------------------------------------------------- oracles
_SQL_TOKS = """
WITH tt AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)
"""

ORACLES: dict[str, str] = {}

ORACLES["dataset_splits"] = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM s GROUP BY split
"""

ORACLES["contamination_overlap"] = f"""{_SQL_TOKS},
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l) - 1),
                                 i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
    FROM tt WHERE len(l) >= 3
  )
),
bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0)
SELECT cast(s.doc_id AS BIGINT) AS doc_id, cast(count(*) AS BIGINT) AS n_overlap
FROM (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0) s
JOIN bsh USING (shingle)
GROUP BY s.doc_id
HAVING count(*) >= {CONTAM_MIN_OVERLAP}
"""

ORACLES["pii_redacted"] = f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {PII_MOD1} = 0
                 THEN ' contact user' || cast(doc_id AS VARCHAR) || '@example.com today'
                 ELSE '' END
         || CASE WHEN doc_id % {PII_MOD2} = 0
                 THEN ' cc admin' || cast(doc_id AS VARCHAR) || '@mail.example.org'
                 ELSE '' END AS text
  FROM documents
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       md5(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g')) AS redacted_md5
FROM planted
"""

ORACLES["split_leakage"] = f"""
WITH d2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {LEAK_OFFSET}, text FROM documents WHERE doc_id % {LEAK_MOD} = 0
),
s AS (
  SELECT md5(text) AS content_hash, doc_id,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM d2
)
SELECT content_hash, cast(count(*) AS BIGINT) AS n_docs,
       cast(count(DISTINCT split) AS BIGINT) AS n_splits,
       cast(min(doc_id) AS BIGINT) AS min_doc
FROM s GROUP BY content_hash HAVING count(DISTINCT split) > 1
"""

ORACLES["repetition_stats"] = f"""{_SQL_TOKS},
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
  FROM tt WHERE len(l) >= 2
),
cnt AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram),
agg AS (
  SELECT doc_id, cast(sum(n) AS BIGINT) AS n_bigrams,
         cast(count(*) AS BIGINT) AS distinct_bigrams
  FROM cnt GROUP BY doc_id
),
top AS (
  SELECT doc_id, bigram AS top_bigram, cast(n AS BIGINT) AS top_bigram_n FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY n DESC, bigram ASC) AS rk
    FROM cnt) WHERE rk = 1
)
SELECT cast(agg.doc_id AS BIGINT) AS doc_id, n_bigrams, distinct_bigrams,
       cast(n_bigrams - distinct_bigrams AS BIGINT) AS dup_bigram_n,
       top_bigram, top_bigram_n
FROM agg JOIN top USING (doc_id)
"""

ORACLES["llm_token_counts"] = r"""
WITH p AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+') AS pieces
  FROM documents
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(n_ws AS BIGINT) AS n_ws_tokens,
       cast(coalesce(list_aggregate(list_transform(pieces, x -> (length(x) + 3) // 4),
                                    'sum'), 0) AS BIGINT) AS n_bpe_tokens
FROM p
"""

ORACLES["token_length_histogram"] = f"""{_SQL_TOKS}
SELECT cast(CASE WHEN len(l) > 0 THEN length(bin(len(l))) - 1 ELSE -1 END AS BIGINT) AS bucket,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(len(l)) AS BIGINT) AS sum_tokens
FROM tt GROUP BY 1
"""


def registry() -> dict:
    return {
        "dataset_splits": q_dataset_splits,
        "contamination_overlap": q_contamination_overlap,
        "pii_redacted": q_pii_redacted,
        "token_length_histogram": q_token_length_histogram,
        "llm_token_counts": q_llm_token_counts,
        "repetition_stats": q_repetition_stats,
        "split_leakage": q_split_leakage,
    }
