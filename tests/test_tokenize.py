from pyspark.sql import functions as F

from news_information_retrieval_system_spark.tokenize import py_tokenize, tokens_col, tokenize_udf


def test_py_tokenize_matches_reference_semantics():
    # reference default tokenizer: re.findall(r'\b\w+\b', text.lower())
    # (src/ir/index/inverted_index.py:89-105)
    assert py_tokenize("Hello, World!") == ["hello", "world"]
    assert py_tokenize("  a--b  c_d 42 ") == ["a", "b", "c_d", "42"]
    assert py_tokenize("") == []
    assert py_tokenize(None) == []


def test_jvm_tokenizer_matches_python(spark):
    texts = [
        ("Hello, World!",),
        ("a--b c_d 42",),
        ("UPPER lower MiXeD",),
        ("trailing space ",),
        (" leading",),
        ("punct!!! only???",),
        ("",),
        ("tabs\tand\nnewlines",),
    ]
    df = spark.createDataFrame(texts, "text string")
    got = df.select(
        tokens_col("text").alias("fast"), tokenize_udf(F.col("text")).alias("ref")
    ).collect()
    for row in got:
        assert row["fast"] == row["ref"]
        # and both match driver-side python
    for (t,), row in zip(texts, got):
        assert row["ref"] == py_tokenize(t)
