"""Doc-partitioned exhaustive BM25 batch scoring.

The naive declarative batch plan (query/bm25.py) explodes each posting
once PER QUERY that contains its term, shuffles the full hit set on
(query_id, doc_id), then shuffles the scored set again for the per-query
window — two wide shuffles proportional to Σ_q Σ_t df(t).

This plan ships each matched posting across the wire ONCE regardless of
how many queries share the term, and finishes everything else inside one
partition pass:

    postings ⋈ BROADCAST(per-term query list + idf)   — map-side
      → repartition(doc_id)                            — THE one shuffle,
                                                         ~df-sized not hit-sized
      → kernel: expand query lists (numpy), accumulate
        per (query, doc) — EXACT because all terms of a
        doc are co-located — per-partition top-k
      → global top-k merge over ≤ parts × |Q| × k rows

Same results as bm25.bm25_topk (tested); the shape mirrors how the WAND
kernel consumes doc-range block groups, minus block decode and pruning —
this is the 'score everything' baseline the north rule's query batches
fall back to when pruning can't help (e.g. deep-k analytics exports).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex


def _make_kernel(k: int, k1: float, b: float, avgdl: float):
    def kernel(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        tf = pdf["tf"].to_numpy(np.float64)
        dl = pdf["dl"].to_numpy(np.float64)
        idf = pdf["idf"].to_numpy(np.float64)
        doc = pdf["doc_id"].to_numpy(np.int64)
        base = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        qlists = pdf["queries"].to_numpy(object)
        lens = np.fromiter((len(x) for x in qlists), dtype=np.int64, count=len(qlists))
        row_rep = np.repeat(np.arange(len(qlists)), lens)
        qids_flat = np.concatenate([[q["query_id"] for q in x] for x in qlists if len(x)]) if lens.sum() else np.array([], dtype=object)
        qtf_flat = (
            np.concatenate([[q["qtf"] for q in x] for x in qlists if len(x)]).astype(np.float64)
            if lens.sum()
            else np.array([], dtype=np.float64)
        )
        if not len(row_rep):
            return
        qcodes, quniq = pd.factorize(qids_flat)
        contrib = base[row_rep] * qtf_flat
        docs_rep = doc[row_rep]
        # accumulate per (query, doc): sort-free via unique on composite key
        key = qcodes.astype(np.int64) << 44 | (docs_rep & ((1 << 44) - 1))
        uniq, inv = np.unique(key, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, contrib)
        u_q = (uniq >> 44).astype(np.int64)
        u_d = (uniq & ((1 << 44) - 1)).astype(np.int64)
        out_q, out_d, out_s = [], [], []
        for qi in range(len(quniq)):
            sel = np.flatnonzero(u_q == qi)
            if sel.size > k:
                # keep every row scoring >= the k-th best: score ties at the
                # boundary must all survive so the global (score desc,
                # doc_id asc) merge can break them deterministically
                kth = np.partition(scores[sel], sel.size - k)[sel.size - k]
                part = sel[scores[sel] >= kth]
            else:
                part = sel
            out_q.append(np.full(part.size, quniq[qi], dtype=object))
            out_d.append(u_d[part])
            out_s.append(scores[part])
        yield pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    return kernel


def bm25_topk_docpart(
    index: FulltextIndex,
    qterms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_partitions: int | None = None,
) -> DataFrame:
    """qterms(query_id, term[, qtf]) → (query_id, rank, doc_id, score).

    NOTE doc_id must fit in 44 bits (dense ids do; 16T docs headroom).
    """
    spark = index.postings.sparkSession
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    n_docs, avgdl = index.scalar_stats()
    qagg = (
        index.term_stats.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(
            F.collect_list(F.struct("query_id", "qtf")).alias("queries"),
            F.first("idf").alias("idf"),
        )
    )
    hits = index.postings.join(F.broadcast(qagg), "term").select(
        "doc_id", "tf", "dl", "idf", "queries"
    )
    parts = num_partitions or spark.sparkContext.defaultParallelism
    kernel = _make_kernel(k, k1, b, avgdl)
    cand = hits.repartition(parts, "doc_id").mapInPandas(
        kernel, schema="query_id string, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
