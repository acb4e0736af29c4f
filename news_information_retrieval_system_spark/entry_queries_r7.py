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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs
from .ops.csoundex import (
    FINAL_CODE,
    INITIAL_CODE,
    csoundex_code_col,
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


def registry() -> dict:
    return {
        "csoundex_codes": q_csoundex_codes,
        "csoundex_homophones": q_csoundex_homophones,
    }
