"""Round-4 NER additions (SURVEY T8): deterministic pattern+gazetteer
entity extraction with the reference's analytics payloads.

* ner_entities — per-(doc, type, surface) entity counts over documents
  with deterministically planted numeric surface forms (dates, times,
  money, percentages, ordinals, cardinals — the corpus text itself is
  digit-free) plus a small gazetteer over corpus vocabulary. The oracle
  re-derives the ENTIRE tagging pipeline from first principles in DuckDB:
  longest-first gazetteer masking, then the priority-ordered regex table
  with progressive masking (each stage runs on the text with all earlier
  stages' matches blanked), so both precedence and the occurrence sets
  are value-checked, not just totals.
* ner_type_stats — the reference entity_statistics payload
  (ner_extractor.py:456-518): per-type count, unique surfaces, pct
  distribution.
* ner_top_entities — most_common_entities (:520-557) with deterministic
  ties.

Offsets (start_pos/end_pos) are not SQL-re-derivable cheaply; they are
pinned by reference-docstring goldens in tests/test_ner.py instead
(ner_extractor.py:101-116, :690-695 demo sentences).

* fmm_segments — the T3/T4 testable fallback (forward-maximum-matching
  segmentation, ops/segment.py) over fixed CJK sentences; FMM is
  iterative per character so no SQL re-derivation exists — the oracle
  is HAND-DERIVED golden VALUES (exact, not a drift gate: the
  algorithm is deterministic and the sentences fixed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs
from .ops.ner import (
    ENTITY_PATTERNS,
    entity_statistics,
    extract_entities,
    most_common_entities,
)

# Gazetteer over tokens that occur in the synthetic corpus vocabulary.
# Constraints the oracle relies on (documented in ops/ner.py): terms are
# space-free, digit-free, mutually non-overlapping in [a-z ] text, and
# the oracle masks them in the same longest-first order the op uses.
NER_GAZ: list[tuple[str, str]] = [
    ("spark", "PRODUCT"),
    ("customer", "PERSON"),
    ("vector", "PRODUCT"),
]

# Planting moduli: every doc_id%4 doc gains a date+time, %5 money+percent,
# %6 ordinal+cardinal — so the oracle sees 0..3 numeric suffixes per doc.
NER_MOD_DT, NER_MOD_MONEY, NER_MOD_ORD = 4, 5, 6


def _planted_ner(d: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    t = F.col("text")
    t = F.when(
        did % NER_MOD_DT == 0,
        F.concat(
            t,
            F.lit(" on 2024-0"), (did % 9 + 1).cast("string"),
            F.lit("-15 at "), (did % 14 + 10).cast("string"), F.lit(":30"),
        ),
    ).otherwise(t)
    t = F.when(
        did % NER_MOD_MONEY == 0,
        F.concat(
            t,
            F.lit(" price $"), (did + 1).cast("string"), F.lit(".25 up "),
            (did % 97).cast("string"), F.lit("%"),
        ),
    ).otherwise(t)
    t = F.when(
        did % NER_MOD_ORD == 0,
        F.concat(
            t,
            F.lit(" the "), (did % 31 + 1).cast("string"),
            F.lit("th run of "), (did * 3 + 7).cast("string"),
        ),
    ).otherwise(t)
    return d.withColumn("text", t)


def _entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_entities(
        _planted_ner(_docs(spark, sf_dir)), gazetteer=NER_GAZ
    )


def q_ner_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _entities(spark, sf_dir)
        .groupBy(
            F.col("doc_id").cast("long").alias("doc_id"),
            "entity_type",
            "entity_text",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_ner_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entity_statistics(_entities(spark, sf_dir))


def q_ner_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return most_common_entities(_entities(spark, sf_dir), top_k=20)


# --------------------------------------------------------------- oracles
_PATS = dict(ENTITY_PATTERNS)

# Same planted text as _planted_ner, in DuckDB arithmetic.
_SQL_PLANTED = f"""
planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {NER_MOD_DT} = 0
                 THEN ' on 2024-0' || cast(doc_id % 9 + 1 AS VARCHAR)
                      || '-15 at ' || cast(doc_id % 14 + 10 AS VARCHAR) || ':30'
                 ELSE '' END
         || CASE WHEN doc_id % {NER_MOD_MONEY} = 0
                 THEN ' price $' || cast(doc_id + 1 AS VARCHAR) || '.25 up '
                      || cast(doc_id % 97 AS VARCHAR) || '%'
                 ELSE '' END
         || CASE WHEN doc_id % {NER_MOD_ORD} = 0
                 THEN ' the ' || cast(doc_id % 31 + 1 AS VARCHAR)
                      || 'th run of ' || cast(doc_id * 3 + 7 AS VARCHAR)
                 ELSE '' END AS t0
  FROM documents
)"""

# Gazetteer masking in the op's longest-first order (customer > vector >
# spark). Blank replacement cannot create or destroy numeric matches
# (terms are digit/symbol-free), but masking is mirrored anyway so the
# oracle is insensitive to that argument.
_GAZ_SORTED = sorted(NER_GAZ, key=lambda p: (-len(p[0]), p[0], p[1]))
_gaz_mask = "t0"
for _term, _ in _GAZ_SORTED:
    _gaz_mask = f"replace({_gaz_mask}, '{_term}', ' ')"

# Progressive numeric masking: stage i runs on the text with stages < i
# replaced by spaces (single-space replacement is count/text-equivalent
# to the op's same-length masking because every pattern is digit-anchored
# and the replacement character breaks digit runs).
_SQL_MASKS = f",\nm0 AS (SELECT doc_id, t0, {_gaz_mask} AS s0 FROM planted)"
_stage_src = "m0"
for _i, (_typ, _pat) in enumerate(ENTITY_PATTERNS):
    _SQL_MASKS += (
        f",\nm{_i + 1} AS (SELECT doc_id, t0, "
        f"regexp_replace(s{_i}, '{_pat}', ' ', 'g') AS s{_i + 1} "
        f"FROM m{_i})"
    )

# Entity multiset: gazetteer occurrences counted on t0 (terms are
# mutually non-overlapping, so independent counting equals the masked
# find-loop), regex stages unnested from their stage's input text.
_GAZ_ROWS = "\nUNION ALL\n".join(
    f"SELECT doc_id, '{term}' AS entity_text, '{typ}' AS entity_type,\n"
    f"       (length(t0) - length(replace(t0, '{term}', ''))) / {len(term)} AS n\n"
    f"FROM planted"
    for term, typ in _GAZ_SORTED
)
_RE_ROWS = "\nUNION ALL\n".join(
    f"SELECT doc_id, unnest(regexp_extract_all(s{i}, '{pat}')) AS entity_text,\n"
    f"       '{typ}' AS entity_type, 1 AS n\nFROM m{i}"
    for i, (typ, pat) in enumerate(ENTITY_PATTERNS)
)
_SQL_ENTS = f"""
WITH {_SQL_PLANTED}{_SQL_MASKS},
ents AS (
  SELECT doc_id, entity_text, entity_type, cast(n AS BIGINT) AS n
  FROM ({_GAZ_ROWS}
UNION ALL
{_RE_ROWS})
  WHERE n > 0
)"""

ORACLES: dict[str, str] = {}

ORACLES["ner_entities"] = f"""{_SQL_ENTS}
SELECT cast(doc_id AS BIGINT) AS doc_id, entity_type, entity_text,
       cast(sum(n) AS BIGINT) AS n
FROM ents GROUP BY 1, 2, 3
"""

ORACLES["ner_type_stats"] = f"""{_SQL_ENTS},
by_type AS (
  SELECT entity_type, cast(sum(n) AS BIGINT) AS n,
         cast(count(DISTINCT entity_text) AS BIGINT) AS n_unique
  FROM ents GROUP BY 1
),
tot AS (SELECT cast(sum(n) AS BIGINT) AS total FROM ents)
SELECT entity_type, n, n_unique, 100.0 * n / total AS pct
FROM by_type CROSS JOIN tot
"""

ORACLES["ner_top_entities"] = f"""{_SQL_ENTS}
SELECT entity_text, entity_type, cast(sum(n) AS BIGINT) AS n
FROM ents GROUP BY 1, 2
ORDER BY n DESC, entity_text ASC, entity_type ASC
LIMIT 20
"""


# ------------------------------------------------------ FMM segmentation
FMM_LEX = [
    "張三", "李四", "台灣大學", "台灣", "台北", "讀書", "在",
    "圖書", "資訊", "圖書資訊", "學系",
]
_FMM_SENTS = [
    ("s1", "張三在台灣大學讀書"),
    ("s2", "李四愛台北"),
    ("s3", "圖書資訊學系"),
    ("s4", "張三在台灣讀書"),
]


def q_fmm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.segment import segment_text

    df = spark.createDataFrame(_FMM_SENTS, "sent_id string, text string")
    toks = df.select("sent_id", segment_text(df, FMM_LEX).alias("t"))
    return toks.select(
        "sent_id", F.posexplode("t").alias("pos", "term")
    ).select("sent_id", F.col("pos").cast("long").alias("pos"), "term")


# Hand-derived goldens (longest-match-first; 台灣大學 > 台灣,
# 圖書資訊 > 圖書; OOV 愛 emits a singleton).
_FMM_GOLD = [
    ("s1", 0, "張三"), ("s1", 1, "在"), ("s1", 2, "台灣大學"), ("s1", 3, "讀書"),
    ("s2", 0, "李四"), ("s2", 1, "愛"), ("s2", 2, "台北"),
    ("s3", 0, "圖書資訊"), ("s3", 1, "學系"),
    ("s4", 0, "張三"), ("s4", 1, "在"), ("s4", 2, "台灣"), ("s4", 3, "讀書"),
]
ORACLES["fmm_segments"] = (
    "SELECT sent_id, cast(pos AS BIGINT) AS pos, term FROM (VALUES "
    + ", ".join(f"('{s}', {p}, '{t}')" for s, p, t in _FMM_GOLD)
    + ") AS v(sent_id, pos, term)"
)


def registry() -> dict:
    return {
        "ner_entities": q_ner_entities,
        "ner_type_stats": q_ner_type_stats,
        "ner_top_entities": q_ner_top_entities,
        "fmm_segments": q_fmm_segments,
    }
