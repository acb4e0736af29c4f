"""Streamed windowed rollups ≡ the batch run of the same expression tree."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.streaming.analytics import (
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(rows):
    return sorted(
        (r["window_start"], r["window_end"], r["event_type"], r["n_events"],
         round(r["total_value"], 6))
        for r in rows
    )


def test_streamed_windows_equal_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    inp = str(tmp_path / "stream_in")
    # two producer files → two micro-batches with maxFilesPerTrigger=1,
    # so windows genuinely accumulate state across batches
    for i in range(2):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    agg = windowed_event_counts(stream, window_duration="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = _norm(spark.sql("select * from win_counts").collect())
    want = _norm(windowed_event_counts(ev, window_duration="6 hours").collect())
    assert got == want and len(got) > 5


def test_sliding_window_shape(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = windowed_event_counts(ev, window_duration="6 hours", slide="3 hours")
    rows = out.collect()
    # every event lands in exactly two sliding windows
    assert sum(r["n_events"] for r in rows) == 2 * ev.count()
