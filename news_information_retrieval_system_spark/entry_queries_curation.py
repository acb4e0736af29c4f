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


# ------------------------------------------------------- duplicate spans
DUPSPAN_K = 5


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span marking (exact-substring-dedup
    marking pass at 5-gram granularity) over the documents table — the
    planted near-dup families share long verbatim runs, so the span
    marker must find exactly those. The oracle re-derives the whole
    pipeline — gram slide, ≥2-distinct-docs dictionary, interval-union
    coverage — from first principles in DuckDB."""
    from .ops.curation import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), k=DUPSPAN_K).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "n_grams",
        "n_dup_grams",
        "dup_tokens",
    )


def q_span_removed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-dedup REMOVAL pass: cut every cross-doc
    duplicated 5-gram span and re-join the survivors. The oracle
    re-derives the full chain — gram dictionary, gaps-and-islands merge
    of duplicated starts, per-token coverage anti-join, text
    reconstruction (md5-compared) — from first principles."""
    from .ops.curation import remove_duplicate_spans

    out = remove_duplicate_spans(_docs(spark, sf_dir), k=DUPSPAN_K)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "n_kept",
        "n_removed",
        F.md5("text").alias("clean_md5"),
    )


# ---------------------------------------------------------- order shuffle
SHUF_SHARDS = 8


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle over the documents table:
    per-doc (shard, pos) placement, reproducible on any engine. The
    oracle recomputes the salted-md5 bucket, mod-shard, and within-shard
    rank from first principles."""
    from .ops.curation import shuffle_shards

    return shuffle_shards(_docs(spark, sf_dir), n_shards=SHUF_SHARDS).select(
        F.col("doc_id").cast("long").alias("doc_id"), "shard", "pos"
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


# ------------------------------------------------- pipeline accounting
# Derived pipeline corpus, all mod-class arithmetic on doc_id: bench docs
# (doc_id % 97 == 0) are held out; doc_id % 31 == 2 becomes junk (fails
# the quality floor); doc_id % 23 == 1 is re-published verbatim at
# +200000 (exact dup); doc_id % 10 == 0 is re-published truncated to 80%
# at +100000 (near dup). The pipeline runs in the LSH completeness
# configuration (bands == num_hashes), so the DuckDB oracle re-derives
# every stage from first principles (quality formula, md5 keep-first,
# exact bigram Jaccard + recursive-CTE components, bench-bigram overlap)
# and the per-stage drop counts must agree exactly.
JUNK_MOD, COPY_MOD, NEAR_MOD = 31, 23, 10
PIPE_MIN_QUALITY = 0.455  # off the 0.01 score grid — no boundary floats
PIPE_MIN_OVERLAP = 25


def _pipeline_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    base = d.filter(F.col("doc_id") % BENCH_MOD != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % JUNK_MOD == 2, F.lit("zz")).otherwise(F.col("text")),
    )
    copies = base.filter(F.col("doc_id") % COPY_MOD == 1).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    trunc = base.filter(F.col("doc_id") % NEAR_MOD == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text) * 0.8) as int))").alias("text"),
    )
    return base.unionByName(copies).unionByName(trunc)


def q_curation_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the COMPOSED pipeline (ops/pipeline.py curate_corpus) and emit
    its per-stage accounting as one row — the whole chain value-checked
    end-to-end, not just its stages."""
    from .ops.pipeline import curate_corpus

    bench = _docs(spark, sf_dir).filter(F.col("doc_id") % BENCH_MOD == 0)
    _, stats = curate_corpus(
        _pipeline_corpus(spark, sf_dir),
        bench.select("doc_id", "text"),
        min_quality=PIPE_MIN_QUALITY,
        jaccard_threshold=0.5,
        contamination_min_overlap=PIPE_MIN_OVERLAP,
        shingle_k=2,
        num_hashes=32,
        bands=32,
        redact_pii=False,  # redaction rewrites text, never drops rows
    )
    cols = ["n_input", "n_low_quality", "n_exact_dup", "n_near_dup",
            "n_contaminated", "n_kept"]
    return spark.createDataFrame(
        [tuple(int(stats[c]) for c in cols)],
        ", ".join(f"{c} long" for c in cols),
    )


# ------------------------------------------------------- sequence packing
SEQ_LEN = 512


def q_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk context packing placement map at seq_len=512 —
    num_ranges=5 forces the two-pass distributed cumsum (per-partition
    totals + prefix offsets) to cross real partition boundaries."""
    from .ops.curation import pack_sequences

    out = pack_sequences(_docs(spark, sf_dir), seq_len=SEQ_LEN, num_ranges=5)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens", "start_token", "first_example", "last_example",
        "n_examples_spanned",
    )


def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.curation import packing_stats

    return packing_stats(_docs(spark, sf_dir), seq_len=SEQ_LEN)


def q_packed_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse placement map: the doc slices filling each training
    example — what a dataloader shard reads to materialize example i."""
    from .ops.curation import example_map

    return example_map(_docs(spark, sf_dir), seq_len=SEQ_LEN, num_ranges=5).select(
        "example_id", F.col("doc_id").cast("long").alias("doc_id"),
        "off_in_doc", "n_in_example",
    )


# ------------------------------------------------------ mixture sampling
SAMPLE_RATES = {"en": 0.5, "fr": 0.25}
SAMPLE_DEFAULT = 0.75


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.curation import hash_stratified_sample

    out = hash_stratified_sample(
        _docs(spark, sf_dir), SAMPLE_RATES, key_col="lang",
        default_rate=SAMPLE_DEFAULT,
    )
    return out.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


# --------------------------------------------------- LM perplexity filter
PPX_TRAIN_MOD = 4   # LM trained on doc_id % 4 != 0 (held-in slice)
PPX_MAX = 31.0      # flags the high-ppx tail (p90 ≈ 31.35 at sf0.01)


def q_ppx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality signal: bigram add-1 LM trained on the
    doc_id%4!=0 slice, every document scored, high-perplexity tail
    flagged. Flag compares the 5dp fixed-point value so both engines
    agree bit-for-bit whenever the rounded perplexity matches."""
    from .ops.curation import perplexity_flags

    d = _docs(spark, sf_dir)
    out = perplexity_flags(
        d, PPX_MAX, lm_train=d.filter(F.col("doc_id") % PPX_TRAIN_MOD != 0),
        n=2, add_k=1.0,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_grams",
        F.round(F.col("perplexity") * 100000).cast("long").alias("ppx_5dp"),
        "flagged",
    )


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

# End-to-end pipeline accounting: DuckDB re-derives EVERY stage of
# curate_corpus from first principles — quality formula, md5 keep-first,
# exact bigram Jaccard + recursive-CTE connected components (valid
# because rows-per-band=1 LSH verified output equals the exact set, cf.
# the minhash_pairs oracle), and bench-bigram overlap. The simple bigram
# expression (no 1-gram fallback for single-token docs) is exact here:
# every quality survivor has ≥8 tokens at sf0.01 (junk docs score 0.44 <
# 0.455 and are dropped before shingling).
from .ops.textstats import EN_STOPWORDS as _SW  # noqa: E402

_SW_IN = ", ".join(f"'{w}'" for w in _SW)

ORACLES["curation_accounting"] = f"""
WITH RECURSIVE
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {JUNK_MOD} = 2 THEN 'zz' ELSE text END AS text
  FROM documents WHERE doc_id % {BENCH_MOD} <> 0
),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 200000, text FROM base WHERE doc_id % {COPY_MOD} = 1
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, cast(floor(length(text) * 0.8) AS INT))
  FROM base WHERE doc_id % {NEAR_MOD} = 0
),
feat AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS l,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct,
         length(text) AS n_chars
  FROM corpus
),
q AS (
  SELECT doc_id, text, l,
    (least(len(l) / 20.0, 1.0) * 0.4
     + greatest(1.0 - (punct * 1.0 / greatest(n_chars, 1)) * 5.0, 0.0) * 0.2
     + CASE WHEN len(l) > 0
                 AND list_aggregate(list_transform(l, x -> length(x)), 'sum') * 1.0 / len(l) >= 2.5
                 AND list_aggregate(list_transform(l, x -> length(x)), 'sum') * 1.0 / len(l) <= 10.0
            THEN 1.0 ELSE 0.5 END * 0.2
     + CASE WHEN len(l) > 0
                 AND len(list_filter(l, x -> x IN ({_SW_IN}))) * 1.0 / len(l) > 0.05
                 AND len(list_filter(l, x -> x IN ({_SW_IN}))) * 1.0 / len(l) < 0.7
            THEN 1.0 ELSE 0.6 END * 0.2) AS score
  FROM feat
),
qkeep AS (SELECT doc_id, text, l FROM q WHERE score >= {PIPE_MIN_QUALITY}),
ded AS (
  SELECT doc_id, text, l FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qkeep
  ) WHERE rn = 1
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS shingle
    FROM ded
  )
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tp AS (
  SELECT doc_a, doc_b FROM pr
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
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
),
nd AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(r) <> node
),
bsh AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS shingle
    FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
          FROM documents WHERE doc_id % {BENCH_MOD} = 0)
  )
),
contam AS (
  SELECT sh.doc_id FROM sh
  JOIN bsh USING (shingle)
  WHERE sh.doc_id NOT IN (SELECT doc_id FROM nd)
  GROUP BY sh.doc_id
  HAVING count(*) >= {PIPE_MIN_OVERLAP}
),
counts AS (
  SELECT (SELECT count(*) FROM corpus) AS n_input,
         (SELECT count(*) FROM qkeep) AS n_q,
         (SELECT count(*) FROM ded) AS n_d,
         (SELECT count(*) FROM nd) AS n_near,
         (SELECT count(*) FROM contam) AS n_cont
)
SELECT cast(n_input AS BIGINT) AS n_input,
       cast(n_input - n_q AS BIGINT) AS n_low_quality,
       cast(n_q - n_d AS BIGINT) AS n_exact_dup,
       cast(n_near AS BIGINT) AS n_near_dup,
       cast(n_cont AS BIGINT) AS n_contaminated,
       cast(n_d - n_near - n_cont AS BIGINT) AS n_kept
FROM counts
"""


_SQL_PACK = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) + 1 AS n
  FROM documents
),
c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) AS cum FROM t)
"""

ORACLES["packed_sequences"] = f"""{_SQL_PACK}
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(n AS BIGINT) AS n_tokens,
       cast(cum - n AS BIGINT) AS start_token,
       cast((cum - n) // {SEQ_LEN} AS BIGINT) AS first_example,
       cast((cum - 1) // {SEQ_LEN} AS BIGINT) AS last_example,
       cast((cum - 1) // {SEQ_LEN} - (cum - n) // {SEQ_LEN} + 1 AS BIGINT)
         AS n_examples_spanned
FROM c
"""

ORACLES["packed_examples"] = f"""{_SQL_PACK}
SELECT cast(e AS BIGINT) AS example_id,
       cast(doc_id AS BIGINT) AS doc_id,
       cast(greatest(0, e * {SEQ_LEN} - (cum - n)) AS BIGINT) AS off_in_doc,
       cast(least(n, (e + 1) * {SEQ_LEN} - (cum - n))
            - greatest(0, e * {SEQ_LEN} - (cum - n)) AS BIGINT) AS n_in_example
FROM (
  SELECT doc_id, n, cum,
         unnest(range(cast((cum - n) // {SEQ_LEN} AS BIGINT),
                      cast((cum - 1) // {SEQ_LEN} + 1 AS BIGINT))) AS e
  FROM c
)
"""

ORACLES["packing_stats"] = f"""{_SQL_PACK}
SELECT cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n) AS BIGINT) AS total_tokens,
       cast((sum(n) + {SEQ_LEN} - 1) // {SEQ_LEN} AS BIGINT) AS n_examples,
       cast(count(*) FILTER (WHERE (cum - 1) // {SEQ_LEN} > (cum - n) // {SEQ_LEN})
            AS BIGINT) AS n_docs_spanning,
       cast(CASE WHEN sum(n) % {SEQ_LEN} = 0 THEN {SEQ_LEN}
                 ELSE sum(n) % {SEQ_LEN} END AS BIGINT) AS last_fill
FROM c
"""

ORACLES["ppx_quality"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
tg AS (
  SELECT doc_id, unnest(tl[1:len(tl)-1]) AS ctx, unnest(tl[2:len(tl)]) AS w
  FROM toks WHERE len(tl) >= 2
),
train AS (
  SELECT ctx, w, count(*) AS c_ng FROM tg
  WHERE doc_id % {PPX_TRAIN_MOD} <> 0 GROUP BY ctx, w
),
ctxc AS (SELECT ctx, sum(c_ng) AS c_ctx FROM train GROUP BY ctx),
vocab AS (SELECT cast(count(DISTINCT t.term) AS DOUBLE) AS v
          FROM (SELECT unnest(tl) AS term FROM toks
                WHERE doc_id % {PPX_TRAIN_MOD} <> 0) t),
scored AS (
  SELECT tg.doc_id,
         ln((coalesce(train.c_ng, 0) + 1.0) /
            (coalesce(ctxc.c_ctx, 0) + 1.0 * vocab.v)) AS logp
  FROM tg
  LEFT JOIN train ON train.ctx = tg.ctx AND train.w = tg.w
  LEFT JOIN ctxc ON ctxc.ctx = tg.ctx
  CROSS JOIN vocab
),
p AS (
  SELECT doc_id, count(*) AS n_grams,
         cast(round(exp(-sum(logp) / count(*)) * 100000) AS BIGINT) AS ppx_5dp
  FROM scored GROUP BY doc_id
)
SELECT cast(doc_id AS BIGINT) AS doc_id, cast(n_grams AS BIGINT) AS n_grams,
       ppx_5dp, ppx_5dp > {int(round(PPX_MAX * 100000))} AS flagged
FROM p
"""

_RATE_CASE = (
    "CASE lang WHEN 'en' THEN '80' WHEN 'fr' THEN '40' ELSE 'c0' END"
)

ORACLES["stratified_sample"] = f"""
SELECT lang, cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
WHERE substr(md5('samp:' || cast(doc_id AS VARCHAR)), 1, 2) < {_RATE_CASE}
GROUP BY lang
"""


ORACLES["duplicate_spans"] = f"""{_SQL_TOKS},
g AS (
  SELECT doc_id, l, len(l) AS n_tokens,
         unnest(generate_series(1, len(l) - {DUPSPAN_K} + 1)) AS pos
  FROM tt WHERE len(l) >= {DUPSPAN_K}
),
g2 AS (
  SELECT doc_id, n_tokens, pos,
         array_to_string(l[pos:pos+{DUPSPAN_K}-1], ' ') AS gram
  FROM g
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM g2 GROUP BY gram
  ) WHERE nd >= 2
),
cov AS (
  SELECT doc_id, n_tokens, pos,
         least(coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          - pos, {DUPSPAN_K}), {DUPSPAN_K}) AS cover
  FROM g2 JOIN dup USING (gram)
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(n_tokens AS BIGINT) AS n_tokens,
       cast(n_tokens - {DUPSPAN_K} + 1 AS BIGINT) AS n_grams,
       cast(count(*) AS BIGINT) AS n_dup_grams,
       cast(sum(cover) AS BIGINT) AS dup_tokens
FROM cov GROUP BY doc_id, n_tokens
"""


ORACLES["span_removed_docs"] = f"""{_SQL_TOKS},
g AS (
  SELECT doc_id, l, len(l) AS n_tokens,
         unnest(generate_series(1, len(l) - {DUPSPAN_K} + 1)) AS pos
  FROM tt WHERE len(l) >= {DUPSPAN_K}
),
g2 AS (
  SELECT doc_id, pos,
         array_to_string(l[pos:pos+{DUPSPAN_K}-1], ' ') AS gram
  FROM g
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM g2 GROUP BY gram
  ) WHERE nd >= 2
),
st AS (SELECT doc_id, pos FROM g2 JOIN dup USING (gram)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {DUPSPAN_K} THEN 1 ELSE 0 END AS b
  FROM st
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM brk
),
iv AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {DUPSPAN_K} AS e
  FROM isl GROUP BY doc_id, isl
),
tokpos AS (
  SELECT doc_id, unnest(l) AS tok,
         unnest(generate_series(1, len(l))) AS p
  FROM tt
),
kept AS (
  SELECT t.doc_id, t.tok, t.p
  FROM tokpos t
  LEFT JOIN iv ON t.doc_id = iv.doc_id AND t.p >= iv.s AND t.p < iv.e
  WHERE iv.doc_id IS NULL
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT cast(tt.doc_id AS BIGINT) AS doc_id,
       cast(len(tt.l) AS BIGINT) AS n_tokens,
       cast(coalesce(clean.n_kept, 0) AS BIGINT) AS n_kept,
       cast(len(tt.l) - coalesce(clean.n_kept, 0) AS BIGINT) AS n_removed,
       md5(coalesce(clean.txt, '')) AS clean_md5
FROM tt LEFT JOIN clean ON tt.doc_id = clean.doc_id
"""

ORACLES["shuffle_order"] = f"""
WITH s AS (
  SELECT doc_id,
         md5('shuf:' || cast(doc_id AS VARCHAR)) AS sort_key
  FROM documents
),
b AS (
  SELECT doc_id, sort_key,
         ((instr('0123456789abcdef', substring(sort_key, 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substring(sort_key, 2, 1)) - 1))
           % {SHUF_SHARDS} AS shard
  FROM s
)
SELECT cast(doc_id AS BIGINT) AS doc_id,
       cast(shard AS BIGINT) AS shard,
       cast(row_number() OVER (PARTITION BY shard
                               ORDER BY sort_key, doc_id) AS BIGINT) AS pos
FROM b
"""


def registry() -> dict:
    return {
        "dataset_splits": q_dataset_splits,
        "duplicate_spans": q_duplicate_spans,
        "span_removed_docs": q_span_removed_docs,
        "shuffle_order": q_shuffle_order,
        "contamination_overlap": q_contamination_overlap,
        "pii_redacted": q_pii_redacted,
        "token_length_histogram": q_token_length_histogram,
        "llm_token_counts": q_llm_token_counts,
        "repetition_stats": q_repetition_stats,
        "split_leakage": q_split_leakage,
        "curation_accounting": q_curation_accounting,
        "packed_sequences": q_packed_sequences,
        "packing_stats": q_packing_stats,
        "stratified_sample": q_stratified_sample,
        "ppx_quality": q_ppx_quality,
        "packed_examples": q_packed_examples,
    }
