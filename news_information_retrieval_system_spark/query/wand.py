"""Block-max WAND / document-at-a-time BM25 top-k over compressed blocks.

Reference semantics: WAND with term upper bounds ``UB(t) = score(max_tf,
min_dl)`` and a top-k heap threshold θ
(src/ir/retrieval/query_optimization.py:76-410). Catalyst has no top-k
early termination (orderBy+limit = TakeOrderedAndProject, full scoring),
so the skipping lives in a grouped kernel; Spark handles the final k-way
merge.

Physical design (exact, not approximate):

* blocks are doc-range sharded (segments.py), so ALL postings of a doc —
  for every query term — share one ``block_key``: scores computed within a
  block group are FINAL scores, and per-group top-k is globally mergeable.
* queries are AGGREGATED PER TERM before touching the blocks
  (``term → [(query_id, qtf)]``), so each block row is shuffled and
  decoded exactly ONCE no matter how many queries share the term — a
  256-query batch sharing stopword terms costs the same decode work as one
  query.
* one shuffle: repartition by ``block_key``; the kernel (one Python call
  per partition) sorts block groups by Σ upper-bound descending, keeps a
  running per-query top-k heap, and skips a group for query q when the
  query's UB sum in that group is below its current θ — adaptive
  partition-local block-max pruning, exact because per-group scores are
  final and per-partition top-k ∪ merge is exact for any valid θ.
* final ``row_number() ≤ k`` over (score desc, doc_id asc) merges.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.codec import decode_block
from ..index.segments import DEFAULT_SPAN_BITS

_NEG_INF = float("-inf")


def _make_kernel(
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    span_bits: int,
    theta0: dict | None = None,
):
    """theta0: per-query LOWER bound on the global k-th best score (from the
    seed pass). Any group whose per-query UB sum is below it can be skipped
    for that query regardless of partition-local heap state — this makes
    pruning effectiveness independent of partition count (the partition-local
    heap alone prunes less the more partitions you run, i.e. anti-scaling)."""
    theta0 = theta0 or {}

    def kernel(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        # group rows by block_key; sort groups by total UB descending so θ
        # tightens as early as possible
        order = np.argsort(pdf["block_key"].to_numpy(), kind="mergesort")
        pdf = pdf.iloc[order].reset_index(drop=True)
        bk = pdf["block_key"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        ends = np.append(starts[1:], len(bk))
        ub_base = pdf["ub_base"].to_numpy(np.float64)
        group_ub = np.add.reduceat(ub_base, starts)
        group_order = np.argsort(-group_ub, kind="mergesort")

        heaps: dict = {}  # query_id -> [(score, -doc_id)] min-heap of size ≤ k

        rows_data = pdf["data"].to_numpy(object)
        rows_n = pdf["n"].to_numpy(np.int64)
        rows_idf = pdf["idf"].to_numpy(np.float64)
        rows_queries = pdf["queries"].to_numpy(object)

        for g in group_order:
            s, e = starts[g], ends[g]
            base = int(bk[s]) << span_bits
            # per-query UB in this group (qtf-weighted)
            q_ub: dict = {}
            for i in range(s, e):
                for ql in rows_queries[i]:
                    qid, qtf = ql["query_id"], ql["qtf"]
                    q_ub[qid] = q_ub.get(qid, 0.0) + qtf * ub_base[i]
            live = []
            for qid, ub in q_ub.items():
                if ub < theta0.get(qid, _NEG_INF):
                    continue
                h = heaps.get(qid)
                if h is None or len(h) < k or ub >= h[0][0]:
                    live.append(qid)
            if not live:
                continue
            live_set = set(live)
            # decode each block row ONCE
            decoded = []
            for i in range(s, e):
                d, tf, dl = decode_block(rows_data[i], int(rows_n[i]), base)
                tf = tf.astype(np.float64)
                contrib = (
                    rows_idf[i]
                    * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
                )
                decoded.append((i, d, contrib))
            # accumulate per live query
            per_q: dict = {}
            for i, d, contrib in decoded:
                for ql in rows_queries[i]:
                    qid = ql["query_id"]
                    if qid not in live_set:
                        continue
                    per_q.setdefault(qid, ([], []))
                    per_q[qid][0].append(d)
                    per_q[qid][1].append(contrib * ql["qtf"])
            for qid, (ds, cs) in per_q.items():
                docs = np.concatenate(ds)
                contribs = np.concatenate(cs)
                uniq, inv = np.unique(docs, return_inverse=True)
                # bincount-with-weights ≈ 5-10x faster than np.add.at
                scores = np.bincount(inv, weights=contribs, minlength=uniq.size)
                h = heaps.setdefault(qid, [])
                for sc, did in zip(scores, uniq):
                    item = (float(sc), -int(did))
                    if len(h) < k:
                        heapq.heappush(h, item)
                    elif item > h[0]:
                        heapq.heapreplace(h, item)
        out_q, out_d, out_s = [], [], []
        for qid, h in heaps.items():
            for sc, ndid in h:
                out_q.append(qid)
                out_d.append(-ndid)
                out_s.append(sc)
        if out_q:
            yield pd.DataFrame(
                {"query_id": out_q, "doc_id": np.array(out_d, dtype=np.int64),
                 "score": np.array(out_s, dtype=np.float64)}
            )

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
    seed_theta: bool = True,  # two-phase θ seeding (exact either way)
) -> DataFrame:
    """blocks: segments.BLOCK_SCHEMA table. qterms_with_idf: (query_id,
    term, qtf, idf). → (query_id, rank, doc_id, score), exact BM25 top-k.

    Two-phase plan (seed_theta=True):
      1. JVM-side per-(query, block_key) UB sums; each query's single
         best-UB group is scored exactly (tiny kernel job) → θ0(q) = its
         k-th best score, a LOWER bound on the global k-th best.
      2. groups where no query's UB reaches its θ0 are dropped JVM-side
         BEFORE the shuffle (semi-join on live block_keys); the kernel
         prunes per-query with max(θ0, partition heap θ).
    Correctness: a group with UB_q < θ0(q) cannot contain a top-k doc for
    q because ≥k docs scoring ≥ θ0(q) already exist (in q's seed group).
    Pruning power is thus independent of partition count — the fix for
    partition-local-θ anti-scaling (more partitions = colder local heaps).
    """
    spark = blocks.sparkSession
    if "qtf" not in qterms_with_idf.columns:
        qterms_with_idf = qterms_with_idf.withColumn("qtf", F.lit(1))
    qagg = qterms_with_idf.groupBy("term").agg(
        F.collect_list(F.struct("query_id", "qtf")).alias("queries"),
        F.first("idf").alias("idf"),
    )
    ub_base = (
        F.col("idf")
        * (F.col("max_tf") * (k1 + 1.0))
        / (F.col("max_tf") + k1 * (1.0 - b + b * F.col("min_dl") / avgdl))
    )
    qmeta = (
        blocks.join(F.broadcast(qagg), "term")
        .withColumn("ub_base", ub_base)
        .select("block_key", "n", "data", "idf", "queries", "ub_base")
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    theta0: dict[str, float] = {}
    if seed_theta:
        # Persist only the small per-(query, block_key) UB aggregate — it is
        # read by two eager jobs below (seed keys + live keys). qmeta itself
        # (the blocks × queries join carrying the data blobs) stays lazy:
        # recomputing its narrow lineage in the final job is cheaper than
        # leaking a cached copy of the whole block table per call.
        qb = (
            qmeta.select("block_key", "ub_base", F.explode("queries").alias("q"))
            .groupBy(F.col("q.query_id").alias("query_id"), F.col("block_key"))
            .agg(F.sum(F.col("q.qtf") * F.col("ub_base")).alias("ub"))
        ).persist()
        wseed = Window.partitionBy("query_id").orderBy(
            F.desc("ub"), F.asc("block_key")
        )
        seed_keys = (
            qb.withColumn("rn", F.row_number().over(wseed))
            .filter(F.col("rn") == 1)
            .select("block_key")
            .distinct()
        )
        seed_kernel = _make_kernel(k, k1, b, avgdl, span_bits)
        seed_cand = (
            qmeta.join(F.broadcast(seed_keys), "block_key")
            .repartition(min(parts, 8), "block_key")
            .mapInPandas(seed_kernel, schema="query_id string, doc_id long, score double")
            .collect()  # ≤ partitions × |Q| × k rows; k-th best computed
        )  # driver-side — cheaper than another shuffle+window job
        by_q: dict[str, list[float]] = {}
        for r in seed_cand:
            by_q.setdefault(r["query_id"], []).append(float(r["score"]))
        theta0 = {
            q: sorted(ss, reverse=True)[k - 1] for q, ss in by_q.items() if len(ss) >= k
        }
        if theta0:
            th_df = spark.createDataFrame(
                list(theta0.items()), "query_id string, theta double"
            )
            # materialize the surviving block keys eagerly (≤ one row per
            # 2^span_bits-doc range) so the final job holds no reference to
            # the cached qb and it can be unpersisted before returning
            live_rows = (
                qb.join(F.broadcast(th_df), "query_id", "left")
                .filter(
                    F.col("theta").isNull() | (F.col("ub") >= F.col("theta"))
                )
                .select("block_key")
                .distinct()
                .collect()
            )
            live_keys = spark.createDataFrame(
                [(r["block_key"],) for r in live_rows], "block_key long"
            )
            qmeta = qmeta.join(F.broadcast(live_keys), "block_key")
        qb.unpersist()
    kernel = _make_kernel(k, k1, b, avgdl, span_bits, theta0)
    candidates = qmeta.repartitionByRange(parts, "block_key").mapInPandas(
        kernel, schema="query_id string, doc_id long, score double"
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
