"""Doc-partitioned exhaustive BM25 batch scoring.

The naive declarative batch plan (query/bm25.py) explodes each posting
once PER QUERY that contains its term, shuffles the full hit set on
(query_id, doc_id), then shuffles the scored set again for the per-query
window — two wide shuffles proportional to Σ_q Σ_t df(t).

This plan ships each matched posting across the wire ONCE regardless of
how many queries share the term, and finishes everything else inside one
partition pass:

    postings ⋈ BROADCAST(term → small int code)       — map-side
      → repartition(doc_id)                            — THE one shuffle,
                                                         ~df-sized not hit-sized
      → numpy kernel: rows carry only (tcode, doc_id,
        tf, dl); the (term → [(query, qtf)], idf)
        table is tiny and travels in the closure.
        Scores are EXACT per partition because all
        terms of a doc are co-located; per-partition
        top-k (ties at the boundary kept).
      → global top-k merge over a candidate set of
        ≤ partitions × |Q| × (k + ties) rows

Kernel cost is O(rows) vectorized numpy + an outer loop over the ~|terms
in batch| × |queries per term| pairs — NO per-row Python (a first version
expanded per-row query lists in Python and was 5x slower than the naive
plan; this one is the design the north rule's 'vectorized pandas/Arrow
UDFs, no per-row Python' demands).

Same results as bm25.bm25_topk (tests/test_bm25_docpart.py); the shape
mirrors how the WAND kernel consumes doc-range block groups, minus block
decode and pruning — the 'score everything' baseline for query batches
where pruning can't help (deep-k analytics exports, score dumps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex


def _make_kernel(
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    idf_by_code: np.ndarray,
    queries_by_code: list,  # tcode -> (qidx int64[], qtf float64[])
    query_ids: list,  # qidx -> query_id string
):
    n_queries = len(query_ids)

    def kernel(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        tcode = pdf["tcode"].to_numpy(np.int64)
        doc = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.float64)
        dl = pdf["dl"].to_numpy(np.float64)
        base = (
            idf_by_code[tcode]
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )
        order = np.argsort(tcode, kind="stable")
        tc_sorted = tcode[order]
        starts = np.flatnonzero(
            np.concatenate(([True], tc_sorted[1:] != tc_sorted[:-1]))
        )
        ends = np.append(starts[1:], tc_sorted.size)
        per_q_docs: list[list] = [[] for _ in range(n_queries)]
        per_q_contribs: list[list] = [[] for _ in range(n_queries)]
        for s, e in zip(starts, ends):
            rows = order[s:e]
            code = int(tc_sorted[s])
            qidx_arr, qtf_arr = queries_by_code[code]
            d_slice = doc[rows]
            b_slice = base[rows]
            for qi, qw in zip(qidx_arr, qtf_arr):
                per_q_docs[qi].append(d_slice)
                per_q_contribs[qi].append(b_slice if qw == 1.0 else b_slice * qw)
        out_q, out_d, out_s = [], [], []
        for qi in range(n_queries):
            if not per_q_docs[qi]:
                continue
            docs_cat = np.concatenate(per_q_docs[qi])
            con_cat = np.concatenate(per_q_contribs[qi])
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            # bincount-with-weights ≈ 5-10x faster than np.add.at
            scores = np.bincount(inv, weights=con_cat, minlength=uniq.size)
            if uniq.size > k:
                # keep every row scoring >= the k-th best: boundary score
                # ties must all survive so the global (score desc, doc_id
                # asc) merge can break them deterministically
                kth = np.partition(scores, uniq.size - k)[uniq.size - k]
                sel = np.flatnonzero(scores >= kth)
            else:
                sel = np.arange(uniq.size)
            out_q.append(np.full(sel.size, query_ids[qi], dtype=object))
            out_d.append(uniq[sel])
            out_s.append(scores[sel])
        if out_q:
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
    assume_doc_partitioned: bool = False,
    max_closure_rows: int = 2_000_000,
) -> DataFrame:
    """qterms(query_id, term[, qtf]) → (query_id, rank, doc_id, score).

    ``assume_doc_partitioned=True`` drops the ``repartition(doc_id)``
    shuffle entirely: the kernel only needs all of a doc's matched
    postings in ONE kernel call, and postings produced by the shuffle-free
    ``build_index`` already satisfy that for ANY input layout — a doc's
    postings derive narrowly from its one source row, so they live in one
    partition. The whole query plan then moves no posting anywhere (scan →
    broadcast join → kernel → tiny top-k merge). Leave False for postings
    of unknown provenance (e.g. repartitioned or hand-built tables).

    SCALE BOUND: the (query × matched-term) table is collected and ships
    in the task closure — |rows| ≤ Σ_q |distinct terms of q|, ~a few
    thousand for a 256-query batch, INDEPENDENT of corpus size. It is NOT
    bounded in the batch size: a 100k-query batch with 30 distinct terms
    each is 3M closure rows (~100 MB serialized). ``max_closure_rows``
    fails fast past the bound instead of silently building a task closure
    that every executor must deserialize; split the batch (the union of
    per-chunk results is exact — queries are independent) or use the
    broadcast-join plan in query/bm25.py for huge batches."""
    spark = index.postings.sparkSession
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    n_docs, avgdl = index.scalar_stats()
    # checked AFTER the (single-job) collect — an up-front count would add
    # a per-call job, and fixed per-call jobs are exactly what caps this
    # plan's scaling at small inputs; the limit+1 fetch still refuses
    # before any task closure ships
    qrows = (
        index.term_stats.join(F.broadcast(qterms), "term")
        .select("term", "idf", "query_id", "qtf")
        .limit(max_closure_rows + 1)
        .collect()
    )
    if len(qrows) > max_closure_rows:
        raise ValueError(
            f"bm25_topk_docpart: query batch expands to more than "
            f"max_closure_rows={max_closure_rows} (query, term) closure "
            "rows. Split the batch into chunks (results union exactly) or "
            "use the broadcast-join plan in bm25.py."
        )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    terms = sorted({r["term"] for r in qrows})
    code_of = {t: i for i, t in enumerate(terms)}
    query_ids = sorted({r["query_id"] for r in qrows})
    qidx_of = {q: i for i, q in enumerate(query_ids)}
    idf_by_code = np.zeros(len(terms), dtype=np.float64)
    buckets: list[list] = [[] for _ in terms]
    for r in qrows:
        c = code_of[r["term"]]
        idf_by_code[c] = r["idf"]
        buckets[c].append((qidx_of[r["query_id"]], float(r["qtf"])))
    queries_by_code = [
        (
            np.array([q for q, _ in bs], dtype=np.int64),
            np.array([w for _, w in bs], dtype=np.float64),
        )
        for bs in buckets
    ]
    tdf = spark.createDataFrame(
        [(t, c) for t, c in code_of.items()], "term string, tcode int"
    )
    hits = index.postings.join(F.broadcast(tdf), "term").select(
        "tcode", "doc_id", "tf", "dl"
    )
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    kernel = _make_kernel(k, k1, b, avgdl, idf_by_code, queries_by_code, query_ids)
    shaped = hits if assume_doc_partitioned else hits.repartition(parts, "doc_id")
    cand = shaped.mapInPandas(
        kernel, schema="query_id string, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
