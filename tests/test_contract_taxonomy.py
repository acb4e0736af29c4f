"""Taxonomy normalization (ops/contract.py taxonomy_cols): exact alias
hit, lowercase fallback, unmapped bucket, labels and paths."""

from news_information_retrieval_system_spark.ops.contract import (
    normalize_records,
    taxonomy_cols,
)


def _records(spark, cats):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cats)], "row_id long, category string"
    )


def test_taxonomy_lookup_precedence(spark):
    df = _records(
        spark, ["finance", "TECH", "bogus", "", None, "  sports  "]
    )
    got = {
        r["row_id"]: (
            r["taxonomy_topic"],
            r["taxonomy_label"],
            r["taxonomy_path"],
        )
        for r in taxonomy_cols(df).collect()
    }
    assert got[0] == ("business", "Business", "news/business/finance")
    # exact miss, lowercase hit
    assert got[1] == ("tech", "Tech", "news/tech/tech")
    # unmapped → unknown bucket
    assert got[2] == ("other", "Other", "news/other/unknown")
    # empty and NULL normalize to the '' alias
    assert got[3] == ("other", "Other", "news/other/unknown")
    assert got[4] == ("other", "Other", "news/other/unknown")
    # values are trimmed before lookup (reference strips)
    assert got[5] == ("sports", "Sports", "news/sports/sports")


def test_taxonomy_custom_dims_and_prefix(spark):
    df = _records(spark, ["x"])
    out = taxonomy_cols(
        df,
        aliases={"x": ("alpha", "leafy")},
        topic_labels={"alpha": "Alpha", "other": "Misc"},
        path_prefix="corp",
    ).collect()[0]
    assert out["taxonomy_path"] == "corp/alpha/leafy"
    assert out["taxonomy_label"] == "Alpha"


def test_normalize_records_carries_taxonomy(spark):
    raw = spark.createDataFrame(
        [
            (1, "a title", "long enough content for the contract x",
             "http://a", "t1,t2", "gadget"),
        ],
        "row_id long, title string, content string, url string, "
        "tags string, category string",
    )
    out, rejected = normalize_records(raw, category_col="category")
    row = out.collect()[0]
    assert row["taxonomy_topic"] == "tech"
    assert row["taxonomy_path"] == "news/tech/gadget"
    assert rejected.count() == 0
    # the raw category column itself does not leak into the output
    assert "category" not in out.columns
