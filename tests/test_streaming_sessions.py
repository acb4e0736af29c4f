"""Stateful streaming sessionization (applyInPandasWithState):
watermark-correct finalization, event-time timeouts, and late events
bridging a provisional gap."""

from datetime import datetime, timedelta

from news_information_retrieval_system_spark.streaming.sessions import (
    stream_sessionize,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def _run(spark, inp, name):
    stream = (
        spark.readStream.schema(spark.read.parquet(inp).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = stream_sessionize(stream, gap_minutes=30, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r["user_id"], r["session_seq"]): (
            r["session_start_s"],
            r["session_end_s"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql(f"select * from {name}").collect()
    }


def test_finalize_only_past_watermark(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write(
        spark,
        [
            (0, 1, T0, 1.0),
            (1, 1, T0 + timedelta(minutes=10), 2.0),
            (2, 2, T0, 5.0),
            (3, 1, T0 + timedelta(hours=3), 4.0),
        ],
        inp,
    )
    # watermark lags one batch: two far-future batches advance it past
    # every T0-era session's end+gap
    _write(spark, [(4, 3, T0 + timedelta(hours=30), 1.0)], inp)
    _write(spark, [(5, 3, T0 + timedelta(hours=31), 1.0)], inp)

    got = _run(spark, inp, "sess_final")
    t0 = int(T0.timestamp())
    assert got[(1, 0)] == (t0, t0 + 600, 2, 3.0)
    assert got[(1, 1)] == (t0 + 3 * 3600, t0 + 3 * 3600, 1, 4.0)
    assert got[(2, 0)] == (t0, t0, 1, 5.0)
    # user 3: final watermark (30h) has NOT cleared 30h-session_end+gap,
    # and the 31h event is openable too — neither session may finalize,
    # even though a gap between them is already visible
    assert all(uid != 3 for uid, _ in got)


def test_late_event_bridges_provisional_gap(spark, tmp_path):
    inp = str(tmp_path / "in")
    # batch 1: two events 50 min apart — a PROVISIONAL gap (> 30 min)
    _write(spark, [(0, 5, T0, 1.0), (1, 5, T0 + timedelta(minutes=50), 1.0)], inp)
    # batch 2: a LATE event at T0+25min (admissible — watermark is far
    # behind) bridges the gap: 25min then 25min, both within gap
    _write(spark, [(2, 5, T0 + timedelta(minutes=25), 1.0)], inp)
    # advance the watermark so the merged session finalizes
    _write(spark, [(3, 6, T0 + timedelta(hours=30), 1.0)], inp)
    _write(spark, [(4, 6, T0 + timedelta(hours=31), 1.0)], inp)

    got = _run(spark, inp, "sess_bridge")
    t0 = int(T0.timestamp())
    # ONE session of three events — an eager-close operator would have
    # wrongly emitted [T0, T0] and a separate [T0+50m] session
    assert got[(5, 0)] == (t0, t0 + 3000, 3, 3.0)
    assert (5, 1) not in got
