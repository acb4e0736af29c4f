"""Stable doc_id assignment under (conv_id, turn_idx) ordering.

The reference assigns dense 0..N-1 ids by enumeration order at build time
(src/ir/index/inverted_index.py:138, src/ir/index/doc_reader.py:52-56) —
that counter is its cross-module primary key. In a distributed build we
need ids that are (a) stable across runs/partitionings and (b) cheap.

Strategies:

* ``dense``  — 0..N-1 in (conv_id, turn_idx) order WITHOUT a global
  window: repartitionByRange + sortWithinPartitions, then per-partition
  row counts → cumulative offsets (one tiny collect) → id = offset[pid] +
  row_within_partition. This is the scalable dense-id pattern; a blocked
  index wants dense ids so doc-range shards are actually dense. Default.
* ``dense_window`` — global ``row_number()``: exact reference semantics,
  single-partition sort; only for small corpora/tests.
* ``hash``   — ``xxhash64(conv_id) << 20 | turn_idx``: zero-shuffle,
  stable, but ids are sparse in int64 space — fine for the flat-postings
  engine, degenerate for doc-range blocking (each block holds ~1 doc).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_BITS = 20


def _dense_ids(df: DataFrame, order_cols: list[str]) -> DataFrame:
    # The exchanged frame MUST be pinned between the counts job and the
    # assign job: RangePartitioner's reservoir sample is seeded with
    # byteswap32(idx ^ (rdd.id << 16)) and rdd.id DIFFERS between the two
    # executions, so an unpersisted plan can draw different partition
    # boundaries per job — verified empirically at 60k rows (59,217
    # distinct ids, max id 61,484: duplicates AND gaps, corrupting every
    # table keyed on doc_id; small test corpora mask it because partitions
    # below the sample size are sampled in full regardless of seed).
    # Hygiene (round-2 finding: don't cache the corpus for the session) is
    # preserved by localCheckpoint(eager)-ing the RESULT and unpersisting
    # the exchange before returning — the cache lives only for this call.
    parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    p = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    p = p.sortWithinPartitions(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    p = p.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in p.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in p.drop("_pid").dtypes
    ) + ", doc_id long"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            off = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = range(off + seen, off + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = p.mapInPandas(assign, schema=out_schema).localCheckpoint(eager=True)
    p.unpersist()
    return out


def with_doc_ids(
    df: DataFrame,
    method: str = "dense",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    if method == "dense":
        return _dense_ids(df, [conv_col, turn_col])
    if method == "dense_window":
        w = Window.orderBy(F.col(conv_col), F.col(turn_col))
        return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    if method == "hash":
        return df.withColumn(
            "doc_id",
            F.shiftleft(F.xxhash64(F.col(conv_col)), TURN_BITS)
            + F.col(turn_col).cast("long"),
        )
    raise ValueError(f"unknown doc_id method: {method}")
