"""Block-max WAND / document-at-a-time BM25 top-k over compressed blocks.

Reference semantics: WAND with term upper bounds ``UB(t) = score(max_tf,
min_dl)`` and pivot-based skipping plus a top-k heap threshold θ
(src/ir/retrieval/query_optimization.py:76-410). Catalyst has no top-k
early termination (orderBy+limit = TakeOrderedAndProject, full scoring),
so the skipping lives in a grouped-map kernel; Spark handles the final
k-way merge.

Physical design (exact, not approximate):

* blocks are doc-range sharded (segments.py), so ALL postings of a doc —
  for every query term — share one ``block_key``: per-group scores are
  final scores, per-group top-k is globally mergeable.
* per (query_id, block_key) group: Σ per-block UBs < θ → skip the group
  without decoding (the block-max skip). Otherwise decode (vectorized
  varint), score document-at-a-time via numpy accumulation, emit the
  group's top-k.
* θ is seeded exactly: the single highest-UB group per query is scored
  first; its k-th best score is a valid global lower bound because group
  scores are final. θ=0 (no pruning) still returns exact results.
* final ``row_number() ≤ k`` over (score desc, doc_id asc) merges the
  per-group candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.codec import decode_block
from ..index.segments import DEFAULT_SPAN_BITS


def _ub_col(k1: float, b: float, avgdl: float):
    return (
        F.col("qtf")
        * F.col("idf")
        * (F.col("max_tf") * (k1 + 1.0))
        / (F.col("max_tf") + k1 * (1.0 - b + b * F.col("min_dl") / avgdl))
    )


def _make_kernel(k: int, k1: float, b: float, avgdl: float, span_bits: int):
    """Partition-wise DAAT kernel (mapInPandas — one Python call per
    partition; per-(query, block_key) Arrow round-trips were the
    bottleneck). Input rows are hash-partitioned and sorted by
    (query_id, block_key)."""

    def _score_group(g: pd.DataFrame, out: list) -> None:
        # strict <: a group whose UB ties θ may still hold a doc tying the
        # k-th score with a smaller doc_id
        theta = float(g["theta"].iloc[0])
        if float(g["ub"].sum()) < theta:
            return
        qid = g["query_id"].iloc[0]
        base = int(g["block_key"].iloc[0]) << span_bits
        all_docs, all_contribs = [], []
        for row in g.itertuples(index=False):
            d, tf, dl = decode_block(row.data, row.n, base)
            tf = tf.astype(np.float64)
            contrib = (
                row.qtf
                * row.idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
            )
            all_docs.append(d)
            all_contribs.append(contrib)
        docs = np.concatenate(all_docs)
        contribs = np.concatenate(all_contribs)
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, contribs)
        if uniq.size > k:
            part = np.argpartition(-scores, k - 1)[:k]
        else:
            part = np.arange(uniq.size)
        out.append(
            pd.DataFrame({"query_id": qid, "doc_id": uniq[part], "score": scores[part]})
        )

    def kernel(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        out: list = []
        for _, g in pdf.groupby(["query_id", "block_key"], sort=False):
            _score_group(g, out)
        if out:
            yield pd.concat(out, ignore_index=True)

    return kernel


def wand_topk(
    blocks: DataFrame,
    qterms_with_idf: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    span_bits: int = DEFAULT_SPAN_BITS,
    seed_theta: bool = True,
) -> DataFrame:
    """blocks: segments.BLOCK_SCHEMA table. qterms_with_idf: (query_id,
    term, qtf, idf). → (query_id, rank, doc_id, score), exact BM25 top-k.
    """
    qmeta = blocks.join(F.broadcast(qterms_with_idf), "term").withColumn(
        "ub", _ub_col(k1, b, avgdl)
    )
    kernel_schema = "query_id string, doc_id long, score double"
    kernel = _make_kernel(k, k1, b, avgdl, span_bits)
    parts = blocks.sparkSession.sparkContext.defaultParallelism

    def run_kernel(df: DataFrame) -> DataFrame:
        return (
            df.repartition(parts, "query_id", "block_key")
            .sortWithinPartitions("query_id", "block_key")
            .mapInPandas(kernel, schema=kernel_schema)
        )

    if seed_theta:
        ubsum = qmeta.groupBy("query_id", "block_key").agg(
            F.sum("ub").alias("ub_sum")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("ub_sum"), F.asc("block_key")
        )
        seeds = (
            ubsum.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("query_id", "block_key")
        )
        seed_scores = run_kernel(
            qmeta.join(F.broadcast(seeds), ["query_id", "block_key"]).withColumn(
                "theta", F.lit(0.0)
            )
        )
        wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        thetas = (
            seed_scores.withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == k)
            .select("query_id", F.col("score").alias("theta"))
        )
        qmeta = qmeta.join(F.broadcast(thetas), "query_id", "left").fillna(
            {"theta": 0.0}
        )
    else:
        qmeta = qmeta.withColumn("theta", F.lit(0.0))

    candidates = run_kernel(qmeta)
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
