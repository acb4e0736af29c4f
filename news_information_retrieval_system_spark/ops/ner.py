"""Named-entity extraction (SURVEY T8) — deterministic pattern+gazetteer
tagger with the reference's NER API surface, Spark-first.

The reference (`/root/reference/src/ir/text/ner_extractor.py:89-557`) wraps
CKIP model inference per text and exposes: entity extraction with character
offsets (`Entity(text, type, start_pos, end_pos)`, :62-86), type filtering
(:377-407), corpus statistics (:456-518) and most-common-entity rollups
(:520-557) over the 18 OntoNotes-style types (:120-124). The model itself
is a heavy BERT dependency (declared non-goal in SURVEY §7), so this module
re-expresses the *pipeline* around a pluggable tagger whose default is a
deterministic pattern + gazetteer layer:

* numeric surface types (TIME, DATE, MONEY, PERCENT, ORDINAL, CARDINAL)
  via a fixed priority-ordered regex table covering both ASCII and the
  reference demo's Chinese forms (2025年 / 500元, ner_extractor.py:690-695);
* lexical types (PERSON, ORG, GPE, …) via a caller-supplied gazetteer
  (term → type), matched longest-first.

Matching semantics are made deterministic by progressive masking: each
layer consumes leftmost non-overlapping matches and blanks them out with
same-length spaces, so later layers can never re-match inside an earlier
entity (a CARDINAL never fires inside a DATE) and character offsets stay
exact on the original text. Both the gazetteer find-loop and Python
``re.finditer`` yield the same occurrence set as SQL ``replace`` /
``regexp_extract_all``, which is what makes the driver oracle a true
from-first-principles re-derivation.

Scale notes: tagging is a per-row map over an Arrow-batched pandas UDF
(no shuffle; the gazetteer rides the task closure — for very large
gazetteers pass a broadcast variable's ``.value``). Every downstream
rollup (statistics, top-k, grouping) is a plain groupBy, map-side
combinable. A model-backed tagger (CKIP/transformers) drops into
``tag_entities_udf`` behind the same row-in/entities-out contract, gated
on import like jieba in tokenize.py.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Priority-ordered surface patterns (reference type set, ner_extractor.py
# :120-124). Order matters: each stage runs on the text with all earlier
# matches masked out. Patterns are ASCII-digit-anchored ([0-9], never \d,
# and no \b) so Python re and RE2-family engines agree byte-for-byte.
ENTITY_PATTERNS: list[tuple[str, str]] = [
    ("TIME", r"[0-9]{1,2}:[0-9]{2}(?::[0-9]{2})?"),
    ("DATE", r"[0-9]{4}-[0-9]{2}-[0-9]{2}"
             r"|[0-9]{4}年(?:[0-9]{1,2}月(?:[0-9]{1,2}日)?)?"
             r"|[0-9]{1,2}月[0-9]{1,2}日"),
    ("MONEY", r"\$[0-9]+(?:\.[0-9]+)?|[0-9]+(?:\.[0-9]+)?元"),
    ("PERCENT", r"[0-9]+(?:\.[0-9]+)?%"),
    ("ORDINAL", r"[0-9]+(?:st|nd|rd|th)|第[0-9一二三四五六七八九十百]+"),
    ("CARDINAL", r"[0-9]+(?:\.[0-9]+)?"),
]

ALL_ENTITY_TYPES = {
    "PERSON", "GPE", "ORG", "LOC", "DATE", "TIME",
    "MONEY", "QUANTITY", "CARDINAL", "ORDINAL", "PERCENT",
    "EVENT", "FAC", "LAW", "LANGUAGE", "NORP", "PRODUCT", "WORK_OF_ART",
}

_ENTITY_SCHEMA = ArrayType(StructType([
    StructField("entity_text", StringType()),
    StructField("entity_type", StringType()),
    StructField("start_pos", IntegerType()),
    StructField("end_pos", IntegerType()),
]))


def _sorted_gazetteer(
    gazetteer: Iterable[tuple[str, str]] | None,
) -> list[tuple[str, str]]:
    """Longest-first (then lexicographic) so an overlapping longer term
    wins deterministically — mirrors CKIP's single-span-per-surface
    behaviour for nested names (台灣大學 beats 台灣)."""
    if not gazetteer:
        return []
    terms = [(t, ty) for t, ty in gazetteer if t and " " not in t]
    if len(terms) != len(list(gazetteer)):
        raise ValueError("gazetteer terms must be non-empty and space-free")
    return sorted(terms, key=lambda p: (-len(p[0]), p[0], p[1]))


def _tag_one(
    text: str | None,
    gaz: list[tuple[str, str]],
    pats: list[tuple[str, re.Pattern]],
) -> list[tuple[str, str, int, int]]:
    """Tag one text: gazetteer layer first (longest-first), then the
    numeric pattern table in priority order, masking each layer's matches
    with same-length spaces so offsets stay exact and later layers cannot
    match inside earlier entities. Reference contract: empty/None text →
    no entities (ner_extractor.py:207-209)."""
    if not text or not text.strip():
        return []
    ents: list[tuple[str, str, int, int]] = []
    masked = text
    for term, typ in gaz:
        start = 0
        while True:
            i = masked.find(term, start)
            if i < 0:
                break
            ents.append((term, typ, i, i + len(term)))
            masked = masked[:i] + " " * len(term) + masked[i + len(term):]
            start = i + len(term)
    for typ, rex in pats:
        spans = []
        for m in rex.finditer(masked):
            ents.append((m.group(0), typ, m.start(), m.end()))
            spans.append((m.start(), m.end()))
        if spans:
            chars = list(masked)
            for s, e in spans:
                chars[s:e] = " " * (e - s)
            masked = "".join(chars)
    ents.sort(key=lambda t: (t[2], t[3], t[1]))
    return ents


def tag_entities_udf(gazetteer: Iterable[tuple[str, str]] | None = None):
    """Arrow-batched pandas UDF: text → array<struct<entity_text,
    entity_type, start_pos, end_pos>>. The deterministic default tagger;
    a model-backed tagger can replace it behind the same contract."""
    gaz = _sorted_gazetteer(list(gazetteer) if gazetteer else None)
    pats = [(t, re.compile(p)) for t, p in ENTITY_PATTERNS]

    @F.pandas_udf(_ENTITY_SCHEMA)
    def _tag(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _tag_one(t, gaz, pats))

    return _tag


def extract_entities(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gazetteer: Iterable[tuple[str, str]] | None = None,
    entity_types: Iterable[str] | None = None,
) -> DataFrame:
    """Exploded entity rows (id, entity_text, entity_type, start_pos,
    end_pos), one per extracted entity, ordered within a doc by offset.
    ``entity_types`` filters like the reference's constructor/type filter
    (ner_extractor.py:169,219-231)."""
    tagged = df.select(
        F.col(id_col),
        F.explode(tag_entities_udf(gazetteer)(F.col(text_col))).alias("e"),
    ).select(
        id_col,
        F.col("e.entity_text").alias("entity_text"),
        F.col("e.entity_type").alias("entity_type"),
        F.col("e.start_pos").alias("start_pos"),
        F.col("e.end_pos").alias("end_pos"),
    )
    if entity_types is not None:
        allowed = sorted(set(entity_types))
        tagged = tagged.where(F.col("entity_type").isin(allowed))
    return tagged


def filter_by_type(entities: DataFrame, types: Iterable[str]) -> DataFrame:
    """Reference filter_by_type (ner_extractor.py:377-407) as a filter."""
    return entities.where(F.col("entity_type").isin(sorted(set(types))))


def entity_statistics(entities: DataFrame) -> DataFrame:
    """Per-type payload of the reference's entity_statistics dict
    (ner_extractor.py:456-518): count, distinct surface forms, and the
    percentage distribution. One groupBy + a broadcast-total join (the
    total is a single scalar row, so the join is a broadcast nested loop
    over k≈18 rows — no shuffle of the entity table beyond the agg)."""
    by_type = entities.groupBy("entity_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("entity_text").alias("n_unique"),
    )
    total = entities.agg(F.count(F.lit(1)).alias("total"))
    return (
        by_type.crossJoin(F.broadcast(total))
        .select(
            "entity_type",
            "n",
            "n_unique",
            (F.lit(100.0) * F.col("n") / F.col("total")).alias("pct"),
        )
    )


def most_common_entities(
    entities: DataFrame, top_k: int = 10, by_type: str | None = None
) -> DataFrame:
    """Reference most_common_entities (ner_extractor.py:520-557) with
    deterministic ties: count desc, then entity_text / entity_type asc."""
    e = entities if by_type is None else filter_by_type(entities, [by_type])
    return (
        e.groupBy("entity_text", "entity_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "entity_text", "entity_type")
        .limit(top_k)
    )
