"""spark-submit entry point: resumable index build + BM25 query batch.

Ship and run as:

    python scripts/package_pyfiles.py   # → dist/nirs_spark.zip
    spark-submit --py-files dist/nirs_spark.zip \\
        scripts/build_and_query_job.py \\
        --input /path/to/transcripts_parquet \\
        --output /path/to/index_dir \\
        --queries "fast table scan" "spark join" \\
        --buckets 8 --top-k 10

On a cluster the same invocation works with --master yarn/k8s; locally it
runs on local[*]. The build is resumable: re-submitting after a failure
skips buckets already recorded in <output>/lineage.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript parquet/table path")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--queries", nargs="*", default=["fast table scan"])
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--span-bits", type=int, default=14)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument(
        "--id-method",
        default="auto",
        choices=["auto", "dense", "hash", "none"],
        help="auto = keep an existing doc_id column, else dense-assign",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("nirs-build-and-query").getOrCreate()
    from news_information_retrieval_system_spark.docids import with_doc_ids
    from news_information_retrieval_system_spark.index.build import build_index
    from news_information_retrieval_system_spark.index.segments import (
        build_resumable,
        load_merged_blocks,
    )
    from news_information_retrieval_system_spark.query.bm25 import query_terms_df
    from news_information_retrieval_system_spark.query.wand import wand_topk

    docs = spark.read.parquet(args.input)
    method = args.id_method
    if method == "auto":
        # keep an existing doc_id only when it's an integral column the
        # doc-range block layout can shift; anything else (string/UUID
        # ids, or no doc_id at all) gets a dense reassignment
        integral = ("int", "bigint", "long", "smallint", "tinyint")
        dtype = dict(docs.dtypes).get("doc_id")
        method = "none" if dtype in integral else "dense"
    if method != "none":
        if "conv_id" in docs.columns:
            docs = with_doc_ids(docs.drop("doc_id"), method)
        else:
            # non-transcript input: stable dense ids ordered by whatever
            # identifier the rows already carry
            docs = docs.withColumnRenamed("doc_id", "_orig_id")
            docs = with_doc_ids(
                docs, method, conv_col="_orig_id", turn_col="_orig_id"
            ).drop("_orig_id")
    docs = docs.select("doc_id", "text")

    t0 = time.time()
    summary = build_resumable(
        spark, docs, args.output, num_buckets=args.buckets, span_bits=args.span_bits
    )
    build_sec = time.time() - t0
    print(json.dumps({"phase": "build", "sec": round(build_sec, 2), **summary}))

    blocks = load_merged_blocks(spark, args.output, args.span_bits).persist()
    idx = build_index(docs)
    n_docs, avgdl = idx.scalar_stats()
    qmap = {f"q{i}": q for i, q in enumerate(args.queries)}
    qdf = query_terms_df(spark, qmap)
    qidf = qdf.join(idx.term_stats.select("term", "idf"), "term")
    t1 = time.time()
    res = wand_topk(
        blocks, qidf, n_docs, avgdl,
        k=args.top_k, k1=args.k1, b=args.b, span_bits=args.span_bits,
    ).collect()
    print(json.dumps({"phase": "query", "sec": round(time.time() - t1, 2),
                      "n_queries": len(qmap), "n_results": len(res)}))
    for r in res:
        print(f"{qmap[r['query_id']]}\t{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
