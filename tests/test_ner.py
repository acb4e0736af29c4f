"""NER tagger parity tests — expected entities/offsets mirror the
reference docstring and demo examples (ner_extractor.py:101-116,
:690-695) with the gazetteer standing in for CKIP's lexical types."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.ner import (
    entity_statistics,
    extract_entities,
    most_common_entities,
)

GAZ = [
    ("張三", "PERSON"),
    ("台灣大學", "ORG"),
    ("台灣", "GPE"),
    ("台北", "GPE"),
]


def _extract(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        extract_entities(df, **kw)
        .orderBy("doc_id", "start_pos")
        .collect()
    )
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["entity_text"], r["entity_type"], r["start_pos"], r["end_pos"])
        )
    return out


def test_reference_docstring_example(spark):
    # ner_extractor.py:101-106: 張三在台灣大學讀書 →
    # PERSON 張三 @0-2, ORG 台灣大學 @3-7
    got = _extract(spark, ["張三在台灣大學讀書"], gazetteer=GAZ)
    assert got[0] == [
        ("張三", "PERSON", 0, 2),
        ("台灣大學", "ORG", 3, 7),
    ]


def test_longest_gazetteer_term_wins(spark):
    # 台灣大學 (ORG) must suppress the nested 台灣 (GPE); a standalone
    # 台灣 still tags GPE.
    got = _extract(spark, ["他在台灣大學", "他來自台灣"], gazetteer=GAZ)
    assert got[0] == [("台灣大學", "ORG", 2, 6)]
    assert got[1] == [("台灣", "GPE", 3, 5)]


def test_demo_sentences_numeric_types(spark):
    # ner_extractor.py:690-695 demo inputs.
    got = _extract(
        spark,
        ["2025年一月台北將舉辦國際研討會", "這本書定價500元，打八折後是400元"],
        gazetteer=GAZ,
    )
    assert ("2025年", "DATE", 0, 5) in got[0]
    assert ("台北", "GPE", 7, 9) in got[0]
    assert [(t, ty) for t, ty, *_ in got[1]] == [
        ("500元", "MONEY"),
        ("400元", "MONEY"),
    ]


def test_priority_masking_ascii(spark):
    got = _extract(
        spark,
        ["meet at 12:30 on 2024-05-06, pay $42.50 or 15% by the 3rd try, 7 items"],
    )
    assert got[0] == [
        ("12:30", "TIME", 8, 13),
        ("2024-05-06", "DATE", 17, 27),
        ("$42.50", "MONEY", 33, 39),
        ("15%", "PERCENT", 43, 46),
        ("3rd", "ORDINAL", 54, 57),
        ("7", "CARDINAL", 63, 64),
    ]


def test_masking_preserves_offsets(spark):
    # TIME consumes its span; the residue is a CARDINAL with offsets on
    # the ORIGINAL text (masking is same-length).
    got = _extract(spark, ["12:3045"])
    assert got[0] == [
        ("12:30", "TIME", 0, 5),
        ("45", "CARDINAL", 5, 7),
    ]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    assert extract_entities(df).count() == 0


def test_type_filter(spark):
    got = _extract(
        spark, ["張三在台北 3rd"], gazetteer=GAZ, entity_types=["PERSON", "GPE"]
    )
    assert [(t, ty) for t, ty, *_ in got[0]] == [
        ("張三", "PERSON"),
        ("台北", "GPE"),
    ]


def test_statistics_and_most_common(spark):
    df = spark.createDataFrame(
        [(0, "張三和張三在台北 12:30"), (1, "台北 14:00")],
        "doc_id long, text string",
    )
    ents = extract_entities(df, gazetteer=GAZ)
    stats = {
        r["entity_type"]: (r["n"], r["n_unique"], r["pct"])
        for r in entity_statistics(ents).collect()
    }
    # 6 entities total: PERSON×2, GPE×2, TIME×2 (one per doc)
    assert stats["PERSON"] == (2, 1, 100.0 * 2 / 6)
    assert stats["GPE"] == (2, 1, 100.0 * 2 / 6)
    assert stats["TIME"] == (2, 2, 100.0 * 2 / 6)

    top = [
        (r["entity_text"], r["n"])
        for r in most_common_entities(ents, top_k=2).collect()
    ]
    # ties broken by entity_text asc
    assert top == [("台北", 2), ("張三", 2)]

    by_type = most_common_entities(ents, top_k=5, by_type="TIME").collect()
    assert sorted(r["entity_text"] for r in by_type) == ["12:30", "14:00"]
