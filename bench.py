"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Phases (all timed, all at $SPARK_GRAFT_SF_DIR / local[$SPARK_GRAFT_CPUS]):
  build_flat        — tokenize + flat postings + stats over a deterministic
                      synthetic transcript corpus scaled to sf (2M turns/sf)
  build_blocked     — delta+varint block encoding of those postings
  bm25_batch        — 64-query BM25 batch (broadcast-join plan) over the
                      transcript index
  wand_batch        — same batch through the block-max WAND kernel
  docs_bm25         — the driver-contract BM25 batch over documents.parquet

Extra keys (not part of the contract, recorded for BENCH/BASELINE.md):
  turns, build_turns_per_sec, qps_bm25, qps_wand, cores
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from news_information_retrieval_system_spark.corpus import synth_transcripts, vocabulary  # noqa: E402
from news_information_retrieval_system_spark.docids import with_doc_ids  # noqa: E402
from news_information_retrieval_system_spark.index.build import build_index  # noqa: E402
from news_information_retrieval_system_spark.index.segments import build_blocked_postings  # noqa: E402
from news_information_retrieval_system_spark.query.bm25 import bm25_topk, query_terms_df  # noqa: E402
from news_information_retrieval_system_spark.query.wand import wand_topk  # noqa: E402
from news_information_retrieval_system_spark.session import get_spark  # noqa: E402

N_QUERIES = 64
TURNS_PER_SF = 2_000_000


def bench_queries(n: int = N_QUERIES) -> dict[str, str]:
    """Deterministic query mix: hot+rare term combinations."""
    vocab = vocabulary()
    qs = {}
    for i in range(n):
        hot = vocab[i % 40]
        mid = vocab[40 + (i * 7) % 400]
        rare = vocab[500 + (i * 131) % 4000]
        qs[f"b{i:03d}"] = f"{hot} {mid} {rare}" if i % 3 else f"{hot} {mid}"
    return qs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    n_turns = max(10_000, int(TURNS_PER_SF * sf))
    spark = get_spark("nirs-bench", cores=cores)
    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    # --- index build over synthetic transcripts (the input_hint table) ---
    docs = with_doc_ids(synth_transcripts(spark, n_turns, seed=42), "dense").select(
        "doc_id", "text"
    )
    idx = build_index(docs)

    def _build_flat():
        idx.postings.persist()
        idx.doc_stats.persist()
        return idx.postings.count()

    n_postings = timed("build_flat", _build_flat)
    n_docs, avgdl = idx.scalar_stats()

    def _build_blocked():
        blk = build_blocked_postings(idx.postings).persist()
        return blk, blk.count()

    blocks, n_blocks = timed("build_blocked", _build_blocked)

    qdf = query_terms_df(spark, bench_queries()).persist()
    qdf.count()
    timed("bm25_batch", lambda: bm25_topk(idx, qdf, k=10).count())
    qidf = qdf.join(idx.term_stats.select("term", "idf"), "term").persist()
    qidf.count()
    timed("wand_batch", lambda: wand_topk(blocks, qidf, n_docs, avgdl, k=10).count())

    # --- driver-contract flagship over documents.parquet ---
    from news_information_retrieval_system_spark import entry_queries as EQ

    timed("docs_bm25", lambda: EQ.q_bm25_topk(spark, sf_dir).count())

    total = round(sum(times.values()), 3)
    build_sec = times["build_flat"] + times["build_blocked"]
    result = {
        "metric": "index_build_plus_query_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "turns": n_turns,
        "n_postings": n_postings,
        "n_blocks": n_blocks,
        "cores": cores,
        "build_turns_per_sec": round(n_turns / build_sec, 1),
        "qps_bm25": round(N_QUERIES / times["bm25_batch"], 2),
        "qps_wand": round(N_QUERIES / times["wand_batch"], 2),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
