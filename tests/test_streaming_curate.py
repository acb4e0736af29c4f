"""Stateless streaming curation: junk dropped, emails redacted, splits
assigned — and the streamed output equals the batch output row-for-row
(same expression tree on both faces)."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.streaming.curate import curate_stream

SF_DIR = "/root/testdata/sf0.001"


def _fixture(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    # plant one junk doc (quality floor) and one email per 7th doc
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 13 == 3, F.lit("zz")).otherwise(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" mail bob@example.com now")),
            ).otherwise(F.col("text"))
        ),
    )


def test_stream_equals_batch(spark, tmp_path):
    docs = _fixture(spark)
    inp = str(tmp_path / "in")
    docs.filter("doc_id < 20").coalesce(1).write.mode("append").parquet(inp)
    docs.filter("doc_id >= 20").coalesce(1).write.mode("append").parquet(inp)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        curate_stream(stream, min_quality=0.455)
        .writeStream.format("memory")
        .queryName("curate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"]: (r["text"], r["split"])
        for r in spark.sql("select * from curate_out").collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["split"])
        for r in curate_stream(docs, min_quality=0.455).collect()
    }
    assert got == want
    # junk dropped, emails redacted, every survivor split-labelled
    assert 3 not in got
    assert all("@" not in t for t, _ in got.values())
    assert any("<EMAIL>" in t for t, _ in got.values())
    assert all(s in ("train", "val", "test") for _, s in got.values())
