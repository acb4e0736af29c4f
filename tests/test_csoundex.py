"""CSoundex parity tests — every expected value below is a documented
reference example (csoundex.py docstrings :252-267, :316-333, :375-381)
or hand-derived from configs/csoundex.yaml."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.csoundex import (
    csoundex_code_col,
    encode_text,
    fuzzy_similarity_col,
    homophone_groups,
    pinyin_components,
)

LEXICON = [
    ("張", "zhang1"),
    ("三", "san1"),
    ("四", "si4"),
    ("世", "shi4"),
    ("界", "jie4"),
    ("一", "yi1"),
    ("五", "wu3"),
    ("雨", "yu3"),
]


def _components(spark, syllables):
    df = spark.createDataFrame([(s,) for s in syllables], "py string")
    base, initial, final, tone = pinyin_components(F.col("py"))
    rows = df.select(
        "py",
        initial.alias("i"),
        final.alias("f"),
        tone.alias("t"),
    ).collect()
    return {r["py"]: (r["i"], r["f"], r["t"]) for r in rows}


def test_normalize_pinyin_reference_examples(spark):
    got = _components(spark, ["zhang1", "yi4", "a1", "ZHANG1 ", "zhang"])
    assert got["zhang1"] == ("zh", "ang", "1")  # docstring :246-248
    assert got["yi4"] == ("", "i", "4")  # docstring :249-250
    assert got["a1"] == ("", "a", "1")  # docstring :251-252
    assert got["ZHANG1 "] == ("zh", "ang", "1")  # lower+strip first
    assert got["zhang"] == ("zh", "ang", "0")  # missing tone → neutral


def test_split_special_cases(spark):
    got = _components(spark, ["wu3", "yu2", "yuan2", "b", "ri4", "er2"])
    assert got["wu3"] == ("", "u", "3")  # w+u → vowel-only u
    assert got["yu2"] == ("", "v", "2")  # yu → v
    assert got["yuan2"] == ("", "van", "2")  # yu- → v-
    # consonant-only quirk: ``final if final else py`` keeps the whole base
    assert got["b"] == ("b", "b", "0")
    assert got["ri4"] == ("r", "i", "4")
    assert got["er2"] == ("", "er", "2")


def _codes(spark, syllables, include_tone=False):
    df = spark.createDataFrame([(s,) for s in syllables], "py string")
    rows = df.select(
        "py", csoundex_code_col(F.col("py"), include_tone).alias("c")
    ).collect()
    return {r["py"]: r["c"] for r in rows}


def test_encode_reference_examples(spark):
    got = _codes(spark, ["zhang1", "san1", "shi4", "jie4", "yi4", "wu3"])
    assert got["zhang1"] == "Z89"  # 張 docstring :316
    assert got["san1"] == "S99"  # 三 encode :376-377
    assert got["shi4"] == "S84"  # 世 encode :380-381
    assert got["jie4"] == "J73"  # 界 encode :380-381
    assert got["yi4"] == "Y04"  # zero initial → 0, i → 4
    assert got["wu3"] == "W05"
    assert _codes(spark, ["zhang1"], include_tone=True)["zhang1"] == "Z891"


def test_encode_text_mixed(spark):
    lex = spark.createDataFrame(LEXICON, "char string, pinyin string")
    docs = spark.createDataFrame(
        [
            (1, "張三"),
            (2, "hello 世界"),  # encode :380-381: "H E L L O S84 J73"
            (3, "張龍!!"),  # 龍 not in lexicon → passes through
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["csoundex"]
        for r in encode_text(docs, lex).collect()
    }
    assert got[1] == "Z89 S99"
    assert got[2] == "H E L L O S84 J73"
    assert got[3] == "Z89 龍"  # punctuation dropped, unknown CJK kept


def test_fuzzy_similarity(spark):
    df = spark.createDataFrame(
        [("Z89 S99", "Z89 S99"), ("Z89 S99", "Z89 S94"), ("Z89", "Z89 S99"),
         ("", "Z89")],
        "a string, b string",
    )
    rows = df.select("a", "b", fuzzy_similarity_col(F.col("a"), F.col("b"))
                     .alias("s")).collect()
    got = {(r["a"], r["b"]): r["s"] for r in rows}
    assert got[("Z89 S99", "Z89 S99")] == 1.0
    assert got[("Z89 S99", "Z89 S94")] == 0.5  # 1 match / max_len 2
    assert got[("Z89", "Z89 S99")] == 0.5  # zip truncates, norm by longer
    assert got[("", "Z89")] == 0.0


def test_homophone_groups(spark):
    # si4 and shi4 differ (S94 vs S84); zhang1/zhang2 collide tonelessly
    coded = spark.createDataFrame(
        [("zhang1",), ("zhang4",), ("si4",), ("shi4",)], "term string"
    ).select("term", csoundex_code_col(F.col("term")).alias("code"))
    rows = homophone_groups(coded).collect()
    assert len(rows) == 1
    assert rows[0]["code"] == "Z89"
    assert rows[0]["n_terms"] == 2
    assert rows[0]["rep_term"] == "zhang1"


def test_find_similar(spark):
    """find_similar semantics (csoundex.py:495-533): threshold is >=,
    ranking descending, head-topk, homophones score 1.0."""
    from news_information_retrieval_system_spark.ops.csoundex import (
        find_similar,
    )

    lex = spark.createDataFrame(LEXICON, "char string, pinyin string")
    cands = encode_text(
        spark.createDataFrame(
            [(1, "張三"), (2, "張四"), (3, "一五"), (4, "張三世")],
            "doc_id int, text string",
        ),
        lex,
    )
    q = encode_text(
        spark.createDataFrame([(10, "張三")], "doc_id int, text string"), lex
    ).withColumnRenamed("doc_id", "query_id")

    rows = find_similar(q, cands, threshold=0.5, topk=8).collect()
    got = {r["doc_id"]: r["similarity"] for r in rows}
    # 張三 vs 張三 = 1.0; vs 張四 = 1/2; vs 張三世 = 2/3 (zip truncates,
    # normalized by the longer length); 一五 (Y01?) shares nothing → out
    assert got == {1: 1.0, 2: 0.5, 4: 2.0 / 3.0}

    top1 = find_similar(q, cands, threshold=0.5, topk=1).collect()
    assert [(r["doc_id"], r["similarity"]) for r in top1] == [(1, 1.0)]

    # threshold is inclusive (sim >= threshold, reference :522)
    at_half = find_similar(q, cands, threshold=0.5).where(
        F.col("similarity") == 0.5
    ).count()
    assert at_half == 1


def test_driver_entries_match_oracle(spark):
    """Local replica of the driver gate for every r7 registry entry."""
    import duckdb

    from news_information_retrieval_system_spark import entry_queries_r7 as R7

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for name, fn in R7.registry().items():
        got = fn(spark, sf_dir).toPandas()
        want = con.execute(R7.ORACLES[name]).fetchdf()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), name
        assert len(got) == len(want) and len(got) > 0, name
        assert got.astype(str).equals(want.astype(str)), name
