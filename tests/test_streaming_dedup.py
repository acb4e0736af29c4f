"""Streaming exact dedup: duplicates planted ACROSS micro-batches are
dropped; each content hash is emitted exactly once and the emitted hash
set equals the batch-distinct set."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.streaming.dedup import (
    exact_dedup_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
    )
    inp = str(tmp_path / "stream_in")
    # batch 1: docs 0-29; batch 2: docs 30-59 PLUS re-sent copies of
    # 0-9 (same text → same hash, new ids) — cross-batch duplicates
    docs.filter("doc_id < 30").coalesce(1).write.mode("append").parquet(inp)
    dups = docs.filter("doc_id < 10").withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    docs.filter("doc_id >= 30").unionByName(dups).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = exact_dedup_stream(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select content_hash, doc_id from dedup_out").collect()
    hashes = [r["content_hash"] for r in rows]
    # exactly once per hash, re-sent copies dropped (none of the +1000 ids)
    assert len(hashes) == len(set(hashes))
    assert all(r["doc_id"] < 1000 for r in rows)
    want = {
        r["content_hash"]
        for r in docs.select(
            F.md5("text").alias("content_hash")
        ).distinct().collect()
    }
    assert set(hashes) == want


def test_batch_face_is_hash_distinct(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .select("doc_id", "text")
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    )
    both = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 5000))
    out = exact_dedup_stream(both).collect()
    assert len(out) == docs.select("text").distinct().count()
