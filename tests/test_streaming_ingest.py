"""Streaming ingest ≡ batch rebuild: documents arriving over a file-source
stream in multiple micro-batches must yield an index whose BM25 rankings
are identical to a one-shot batch build of the same corpus."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.query.bm25 import score_bm25
from news_information_retrieval_system_spark.query import query_terms_df
from news_information_retrieval_system_spark.streaming import (
    hydrate_stream_index,
    stream_index,
)

SF_DIR = "/root/testdata/sf0.001"


def _topk(idx, spark, k=10):
    q = query_terms_df(spark, {"q1": "fast table scan", "q2": "index merge cost"})
    out = score_bm25(idx, q)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("doc_id")
    )
    return sorted(
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id")
        .collect()
    )


def test_stream_ingest_equals_rebuild(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "index_store")

    # three producer files → with maxFilesPerTrigger=1, three micro-batches
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    q = stream_index(
        spark,
        inp,
        docs.schema,
        out,
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(300)
    assert not q.isActive

    # at least two segment directories (micro-batches) were written
    import glob

    segs = glob.glob(f"{out}/segments/batch_id=*")
    assert len(segs) >= 2, segs

    streamed = hydrate_stream_index(spark, out, spark.read.parquet(inp))
    batch = build_index(docs)
    got = _topk(streamed, spark)
    want = _topk(batch, spark)
    assert got == want and len(got) == 20


def test_stream_restart_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "index_store")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(inp)

    q = stream_index(spark, inp, docs.schema, out, available_now=True)
    q.awaitTermination(300)

    # more files arrive; a SECOND start from the same checkpoint must only
    # process the new data (file-source exactly-once), not re-ingest
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(inp)
    q2 = stream_index(spark, inp, docs.schema, out, available_now=True)
    q2.awaitTermination(300)

    streamed = hydrate_stream_index(spark, out, spark.read.parquet(inp))
    batch = build_index(docs)
    # every doc indexed exactly once: doc sets identical, no duplicates
    s_ids = sorted(r[0] for r in streamed.postings.select("doc_id").distinct().collect())
    b_ids = sorted(r[0] for r in batch.postings.select("doc_id").distinct().collect())
    assert s_ids == b_ids
    assert _topk(streamed, spark) == _topk(batch, spark)
