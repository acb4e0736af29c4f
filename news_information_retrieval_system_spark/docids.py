"""Stable doc_id assignment under (conv_id, turn_idx) ordering.

The reference assigns dense 0..N-1 ids by enumeration order at build time
(src/ir/index/inverted_index.py:138, src/ir/index/doc_reader.py:52-56) —
that counter is its cross-module primary key. In a distributed build we
need an id that is (a) stable across runs/partitionings and (b) cheap.

Two strategies:

* ``hash``  — ``xxhash64(conv_id) << 20 | turn_idx``: embarrassingly
  parallel, no shuffle, stable. The 2^20 turn budget per conversation keeps
  ids unique as long as turn_idx < 1,048,576. Default at scale.
* ``dense`` — global ``row_number() - 1`` ordered by (conv_id, turn_idx):
  matches the reference's dense-universe semantics (needed for NOT-query
  universes and rank-identity vs the enumeration-order oracle). Costs a
  global sort — use only when dense ids are semantically required; at
  100 TB prefer ``hash`` + anti-join NOT semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_BITS = 20


def with_doc_ids(
    df: DataFrame,
    method: str = "hash",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    if method == "hash":
        # shiftleft keeps ids positive-ordered within a conversation so that
        # (conv_id, turn_idx) ordering is recoverable from doc_id alone.
        return df.withColumn(
            "doc_id",
            F.shiftleft(F.xxhash64(F.col(conv_col)), TURN_BITS)
            + F.col(turn_col).cast("long"),
        )
    if method == "dense":
        w = Window.orderBy(F.col(conv_col), F.col(turn_col))
        return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    raise ValueError(f"unknown doc_id method: {method}")
