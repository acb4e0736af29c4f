"""Round-4 final additions: CSoundex phonetic encoding (SURVEY T7).

* csoundex_codes — the full pinyin-syllable parse + bucket encoding
  (reference csoundex.py:232-362) applied to every distinct corpus term
  (the encoder is a pure string function; running it over the term
  dictionary value-checks the complete initial/final rule table and the
  y/w re-spelling edge cases against a from-first-principles DuckDB
  re-derivation — both CASE maps are generated from the SAME Python
  dicts, so the rule tables cannot drift between engines).
* csoundex_homophones — homophone matching (同音字匹配): terms grouped
  by loose 3-char code, the reference's find_similar/homophone use case
  as one groupBy.
* csoundex_similar — the distributed find_similar scan (reference
  csoundex.py:495-533): per-document phonetic signatures (codes of the
  first 4 letter-initial tokens) scored against query signatures with
  the zip-truncated fuzzy similarity, kept at >= threshold, top-k per
  query with deterministic ties. Similarities are exact quarters
  (matches/4) so the float compare is bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs
from .ops.csoundex import (
    FINAL_CODE,
    INITIAL_CODE,
    csoundex_code_col,
    find_similar,
    homophone_groups,
    pinyin_components,
)


def _corpus_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct letter-initial tokens (documents.text is [a-z0-9 ], so a
    whitespace split matches the DuckDB oracle's string_split exactly)."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .where((F.col("term") != "") & F.col("term").rlike("^[a-z]"))
        .distinct()
    )


def _coded_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    terms = _corpus_terms(spark, sf_dir)
    base, initial, final, tone = pinyin_components(F.col("term"))
    return terms.select(
        "term",
        initial.alias("initial"),
        final.alias("final"),
        tone.alias("tone"),
        csoundex_code_col(F.col("term")).alias("code"),
        csoundex_code_col(F.col("term"), include_tone=True).alias("code_tone"),
    )


def q_csoundex_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _coded_terms(spark, sf_dir)


def q_csoundex_homophones(spark: SparkSession, sf_dir: str) -> DataFrame:
    coded = _coded_terms(spark, sf_dir).select("term", "code")
    return homophone_groups(coded)


# find_similar driver entry: fixed query signatures vs per-doc signatures.
_SIMILAR_QUERIES = [
    ("q1", "fast table scan data"),
    ("q2", "data scan table fast"),
]
_SIG_LEN = 4
_SIM_THRESHOLD = 0.25
_SIM_TOPK = 10


def _signature_col(text: Column) -> Column:
    """Space-joined CSoundex codes of the first _SIG_LEN letter-initial
    tokens — the document's phonetic signature."""
    toks = F.slice(
        F.filter(F.split(text, " "), lambda t: t.rlike("^[a-z]")),
        1,
        _SIG_LEN,
    )
    return F.concat_ws(
        " ", F.transform(toks, lambda t: csoundex_code_col(t))
    )


def q_csoundex_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = _docs(spark, sf_dir).select(
        "doc_id", _signature_col(F.col("text")).alias("csoundex")
    )
    qdf = spark.createDataFrame(
        _SIMILAR_QUERIES, "query_id string, qtext string"
    ).select("query_id", _signature_col(F.col("qtext")).alias("csoundex"))
    return find_similar(
        qdf, cands, threshold=_SIM_THRESHOLD, topk=_SIM_TOPK
    )


def _case_sql(col: str, mapping: dict[str, int]) -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in mapping.items())
    return f"CASE {col} {whens} ELSE 0 END"


# DuckDB re-derivation of the whole parse: tone strip → longest-first
# initial match → y/w re-spellings → bucket CASE maps (generated from the
# same INITIAL_CODE/FINAL_CODE dicts the Spark path uses).
_SQL_CODED = f"""
WITH toks AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
p0 AS (
  SELECT term, lower(trim(term)) AS py FROM toks
  WHERE regexp_matches(term, '^[a-z]')
),
p1 AS (
  SELECT term, py,
         CASE WHEN regexp_matches(py, '[0-9]$')
              THEN substr(py, 1, length(py) - 1) ELSE py END AS base,
         CASE WHEN regexp_matches(py, '[0-9]$')
              THEN substr(py, length(py), 1) ELSE '0' END AS tone
  FROM p0
),
p2 AS (
  SELECT *, regexp_extract(base,
      '^(zh|ch|sh|b|p|m|f|d|t|n|l|g|k|h|j|q|x|r|z|c|s|y|w)', 1) AS init0
  FROM p1
),
p3 AS (SELECT *, substr(base, length(init0) + 1) AS rest FROM p2),
p4 AS (
  SELECT term, py, base, tone,
         CASE WHEN init0 = 'y' AND rest IN ('i', '') THEN ''
              WHEN init0 = 'w' AND rest IN ('u', '') THEN ''
              WHEN init0 = 'y' AND rest LIKE 'u%' THEN ''
              ELSE init0 END AS initial,
         CASE WHEN init0 = 'y' AND rest IN ('i', '') THEN 'i'
              WHEN init0 = 'w' AND rest IN ('u', '') THEN 'u'
              WHEN init0 = 'y' AND rest LIKE 'u%' THEN 'v' || substr(rest, 2)
              WHEN rest = '' THEN base
              ELSE rest END AS final
  FROM p3
),
coded AS (
  SELECT term, initial, final, tone,
         upper(substr(py, 1, 1))
           || cast({_case_sql('initial', INITIAL_CODE)} AS VARCHAR)
           || cast({_case_sql('final', FINAL_CODE)} AS VARCHAR) AS code
  FROM p4
)
"""

ORACLES: dict[str, str] = {}

ORACLES["csoundex_codes"] = f"""{_SQL_CODED}
SELECT term, initial, final, tone, code, code || tone AS code_tone
FROM coded
"""

ORACLES["csoundex_homophones"] = f"""{_SQL_CODED}
SELECT code, count(*) AS n_terms, min(term) AS rep_term
FROM coded GROUP BY code HAVING count(*) >= 2
"""

# find_similar re-derivation: same parse chain, applied per (owner, pos)
# to both document and query token streams, zip-positional match count
# over the length-capped signatures, threshold + per-query top-k.
_Q_VALUES = ", ".join(f"('{qid}', '{qtext}')" for qid, qtext in _SIMILAR_QUERIES)
_MATCH_TERMS = " + ".join(
    f"(CASE WHEN len(d.codes) >= {i} AND len(q.codes) >= {i} "
    f"AND d.codes[{i}] = q.codes[{i}] THEN 1 ELSE 0 END)"
    for i in range(1, _SIG_LEN + 1)
)

ORACLES["csoundex_similar"] = f"""
WITH qrows AS (SELECT * FROM (VALUES {_Q_VALUES}) AS v(owner, text)),
src AS (
  SELECT 'd' AS kind, CAST(doc_id AS VARCHAR) AS owner, text FROM documents
  UNION ALL
  SELECT 'q' AS kind, owner, text FROM qrows
),
toks AS (
  SELECT kind, owner,
         list_filter(string_split(text, ' '),
                     x -> regexp_matches(x, '^[a-z]'))[1:{_SIG_LEN}] AS t
  FROM src
),
ex AS (
  SELECT kind, owner, unnest(t) AS term, unnest(range(1, len(t) + 1)) AS pos
  FROM toks WHERE len(t) > 0
),
p1 AS (
  SELECT kind, owner, pos, lower(trim(term)) AS py FROM ex
),
p2 AS (
  SELECT *, CASE WHEN regexp_matches(py, '[0-9]$')
                 THEN substr(py, 1, length(py) - 1) ELSE py END AS base
  FROM p1
),
p3 AS (
  SELECT *, regexp_extract(base,
      '^(zh|ch|sh|b|p|m|f|d|t|n|l|g|k|h|j|q|x|r|z|c|s|y|w)', 1) AS init0
  FROM p2
),
p4 AS (SELECT *, substr(base, length(init0) + 1) AS rest FROM p3),
p5 AS (
  SELECT kind, owner, pos, py, base,
         CASE WHEN init0 = 'y' AND rest IN ('i', '') THEN ''
              WHEN init0 = 'w' AND rest IN ('u', '') THEN ''
              WHEN init0 = 'y' AND rest LIKE 'u%' THEN ''
              ELSE init0 END AS initial,
         CASE WHEN init0 = 'y' AND rest IN ('i', '') THEN 'i'
              WHEN init0 = 'w' AND rest IN ('u', '') THEN 'u'
              WHEN init0 = 'y' AND rest LIKE 'u%' THEN 'v' || substr(rest, 2)
              WHEN rest = '' THEN base
              ELSE rest END AS final
  FROM p4
),
codedx AS (
  SELECT kind, owner, pos,
         upper(substr(py, 1, 1))
           || cast({_case_sql('initial', INITIAL_CODE)} AS VARCHAR)
           || cast({_case_sql('final', FINAL_CODE)} AS VARCHAR) AS code
  FROM p5
),
sigs AS (
  SELECT kind, owner, list(code ORDER BY pos) AS codes
  FROM codedx GROUP BY kind, owner
),
pairs AS (
  SELECT q.owner AS query_id, CAST(d.owner AS BIGINT) AS doc_id,
         ({_MATCH_TERMS})::DOUBLE
           / greatest(len(d.codes), len(q.codes)) AS similarity
  FROM (SELECT * FROM sigs WHERE kind = 'd') d
  CROSS JOIN (SELECT * FROM sigs WHERE kind = 'q') q
),
ranked AS (
  SELECT query_id, doc_id, similarity,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY similarity DESC, doc_id ASC) AS rnk
  FROM pairs WHERE similarity >= {_SIM_THRESHOLD}
)
SELECT query_id, doc_id, similarity FROM ranked WHERE rnk <= {_SIM_TOPK}
"""


def registry() -> dict:
    return {
        "csoundex_codes": q_csoundex_codes,
        "csoundex_homophones": q_csoundex_homophones,
        "csoundex_similar": q_csoundex_similar,
    }
