"""Streaming sessionization: custom stateful operator via
``applyInPandasWithState`` with event-time timeouts.

The continuous face of ``ops/sessions.py`` (same gap semantics), and
WATERMARK-CORRECT: a session finalizes only once the event-time
watermark has passed ``session_end + gap`` — before that, a late event
(which the watermark still admits) could extend the session or bridge
two provisional sessions, so events stay buffered in the state store.
Eagerly closing on the first observed gap would emit sessions a
still-admissible straggler can invalidate; this operator never does.
Spark drops events older than the watermark before they reach the
operator, so a finalized session can never resurrect.

State per user = the buffered events newer than ``watermark − gap``
(plus a session counter) — bounded by per-user arrival rate within one
lateness window, the standard sizing for streaming sessionization. The
last session of a quiet user flushes through an EventTimeTimeout set at
``last_event + gap``.

Emitted rows are FINAL sessions only (append semantics): identical to
what the batch ``sessionize`` computes over the same rows, restricted
to sessions whose finalization the watermark has proven. Stop the
stream early and open sessions simply wait in the checkpoint for a
restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("session_start_s", T.LongType()),
        T.StructField("session_end_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("ts_buf", T.ArrayType(T.LongType())),
        T.StructField("val_buf", T.ArrayType(T.DoubleType())),
    ]
)


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming events → finalized sessions (user_id, session_seq,
    session_start_s, session_end_s, n_events, total_value).

    ``watermark`` is the lateness bound (how long to wait for stragglers
    before a session may finalize); ``gap_minutes`` the inactivity gap,
    identical to the batch ``sessionize``.
    """
    gap_s = gap_minutes * 60

    def fn(key, pdfs, state):
        import pandas as pd

        (uid,) = key
        wm_s = state.getCurrentWatermarkMs() // 1000
        if state.exists:
            seq, ts_buf, val_buf = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
        else:
            seq, ts_buf, val_buf = 0, [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_buf.extend(int(x) for x in pdf["_evt_s"])
                val_buf.extend(float(x) for x in pdf["_val"])
        order = sorted(range(len(ts_buf)), key=ts_buf.__getitem__)
        ts_buf = [ts_buf[i] for i in order]
        val_buf = [val_buf[i] for i in order]

        # provisional sessions = gap-split of the buffer; session ends are
        # monotone, so finalize a leading prefix and stop at the first
        # session the watermark hasn't cleared
        bounds, lo = [], 0
        for j in range(1, len(ts_buf)):
            if ts_buf[j] - ts_buf[j - 1] > gap_s:
                bounds.append((lo, j - 1))
                lo = j
        if ts_buf:
            bounds.append((lo, len(ts_buf) - 1))
        rows, consumed = [], 0
        for lo, hi in bounds:
            if ts_buf[hi] + gap_s > wm_s:
                break
            rows.append(
                {
                    "user_id": uid,
                    "session_seq": seq,
                    "session_start_s": ts_buf[lo],
                    "session_end_s": ts_buf[hi],
                    "n_events": hi - lo + 1,
                    "total_value": float(sum(val_buf[lo : hi + 1])),
                }
            )
            seq += 1
            consumed = hi + 1
        ts_buf, val_buf = ts_buf[consumed:], val_buf[consumed:]
        if ts_buf:
            state.update((int(seq), ts_buf, val_buf))
            state.setTimeoutTimestamp((ts_buf[-1] + gap_s) * 1000)
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(rows)

    prepared = (
        events.withColumn("_evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("_evt", watermark)
        .select(
            F.col(user_col).alias("user_id"),
            "_evt",
            F.unix_timestamp("_evt").alias("_evt_s"),
            F.col(value_col).alias("_val"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
