"""FMM segmentation goldens — sentences and expected segmentations
mirror the reference tokenizer docs/examples
(chinese_tokenizer.py:118-310, ner_extractor.py:101-116) under the
classical forward-maximum-matching semantics."""

from news_information_retrieval_system_spark.ops.segment import segment_text

LEXICON = [
    "張三", "李四", "台灣大學", "台灣", "台北", "讀書", "在",
    "圖書", "資訊", "圖書資訊", "學系", "研討會", "國際",
]


def _seg(spark, texts, lexicon=LEXICON):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        df.select("doc_id", segment_text(df, lexicon).alias("toks"))
        .orderBy("doc_id")
        .collect()
    )
    return [list(r["toks"]) for r in rows]


def test_longest_match_wins(spark):
    # 台灣大學 (4 chars) beats 台灣 (2) at the same start position
    got = _seg(spark, ["張三在台灣大學讀書", "張三在台灣讀書"])
    assert got[0] == ["張三", "在", "台灣大學", "讀書"]
    assert got[1] == ["張三", "在", "台灣", "讀書"]


def test_oov_chars_emit_singletons(spark):
    got = _seg(spark, ["李四愛台北"])
    assert got[0] == ["李四", "愛", "台北"]


def test_compound_prefix_chain(spark):
    # 圖書資訊 (4) wins over 圖書 (2); the remainder 學系 matches whole
    got = _seg(spark, ["圖書資訊學系"])
    assert got[0] == ["圖書資訊", "學系"]


def test_mixed_ascii_and_whitespace(spark):
    got = _seg(spark, ["張三 loves 台北"])
    # whitespace dropped; ASCII letters are OOV singletons
    assert got[0] == ["張三", "l", "o", "v", "e", "s", "台北"]


def test_empty_and_null(spark):
    df_texts = ["", None]
    got = _seg(spark, df_texts)
    assert got == [[], []]


def test_segments_feed_the_index_pipeline(spark):
    """The segmented column drops into the same explode→postings shape
    the ASCII tokenizer feeds — the Chinese path is the same pipeline."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "張三在台灣大學讀書"), (1, "李四在台北讀書")],
        "doc_id long, text string",
    )
    toks = df.select("doc_id", segment_text(df, LEXICON).alias("t"))
    postings = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
    )
    got = {r["term"]: (r["tf"], r["df"]) for r in postings.collect()}
    assert got["讀書"] == (2, 2)
    assert got["台灣大學"] == (1, 1)
    assert got["在"] == (2, 2)
