"""Fine-grained phase profiler — where does wall time actually go at a
given local[N]? Usage: python scripts/profile_phases.py <cores> [turns]"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from news_information_retrieval_system_spark.session import get_spark  # noqa: E402

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
turns = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

T0 = time.time()
marks: list[tuple[str, float]] = []


def mark(name: str) -> None:
    marks.append((name, time.time()))


spark = get_spark("profile", cores=cores)
mark("session")

import bench  # noqa: E402

path = bench.ensure_corpus(spark, turns)
mark("ensure_corpus")

docs = spark.read.parquet(path).select("doc_id", "text")
docs.count()
mark("scan_count")

from news_information_retrieval_system_spark.index.build import build_index  # noqa: E402

idx = build_index(docs)
toks_cnt = idx.doc_stats.count()  # tokenize + size only
mark("tokenize_docstats")

idx.postings.persist().count()
mark("postings_agg")

idx.term_stats.persist().count()
mark("term_stats")

from news_information_retrieval_system_spark.index.segments import build_blocked_postings  # noqa: E402

blk = build_blocked_postings(idx.postings).persist()
blk.count()
mark("build_blocked")

from news_information_retrieval_system_spark.query.bm25 import bm25_topk, query_terms_df, score_bm25  # noqa: E402

qdf = query_terms_df(spark, bench.bench_queries()).persist()
qdf.count()
mark("query_df")

sc = score_bm25(idx, qdf)
n_hits = sc.count()
mark(f"bm25_scores({n_hits})")

bm25_topk(idx, qdf, k=10).count()
mark("bm25_topk")

from news_information_retrieval_system_spark.query.wand import wand_topk  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

n_docs, avgdl = idx.scalar_stats()
qidf = qdf.join(idx.term_stats.select("term", "idf"), "term").persist()
qidf.count()
mark("qidf")

wand_topk(blk, qidf, n_docs, avgdl, k=10).count()
mark("wand_topk")
wand_topk(blk, qidf, n_docs, avgdl, k=10).count()
mark("wand_topk_2nd")

prev = T0
print(f"\n=== cores={cores} turns={turns} ===")
for name, t in marks:
    print(f"{name:28s} {t - prev:8.2f}s")
    prev = t
print(f"{'TOTAL':28s} {prev - T0:8.2f}s")
spark.stop()
