"""spark-submit wrapper for the end-to-end curation pipeline.

    python3 scripts/package_pyfiles.py
    spark-submit --py-files dist/nirs_spark.zip scripts/curation_job.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated \
        [--bench <benchmark.parquet>] [--report /tmp/curated/stats.json]

Writes the curated corpus as parquet partitioned by ``split`` (so a
trainer prunes to its split at scan time) and the per-stage row
accounting as one JSON line — the lineage record a pipeline run leaves
behind.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from news_information_retrieval_system_spark.ops.pipeline import curate_corpus  # noqa: E402
from news_information_retrieval_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--bench", default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument(
        "--lang-allow", default=None,
        help="comma-separated lang-ID labels to keep (e.g. en,en-ish); "
             "gate runs before the quality floor",
    )
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--contamination-min-overlap", type=int, default=5)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument(
        "--pack-seq-len", type=int, default=None,
        help="also write the train split's packing placement map "
             "(concat-and-chunk at this example length) to "
             "<output>_packed",
    )
    args = ap.parse_args()

    spark = get_spark("curation-job", cores=args.cores)
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.bench) if args.bench else None
    out, stats = curate_corpus(
        docs,
        bench,
        lang_allow=set(args.lang_allow.split(",")) if args.lang_allow else None,
        min_quality=args.min_quality,
        jaccard_threshold=args.jaccard_threshold,
        contamination_min_overlap=args.contamination_min_overlap,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    if args.pack_seq_len:
        from pyspark.sql import functions as F

        from news_information_retrieval_system_spark.ops.curation import (
            pack_sequences,
        )

        train = spark.read.parquet(args.output).filter(F.col("split") == "train")
        placed = pack_sequences(train, seq_len=args.pack_seq_len)
        placed.write.mode("overwrite").parquet(args.output + "_packed")
        stats["n_packed_docs"] = placed.count()
    line = json.dumps(stats)
    if args.report:
        Path(args.report).write_text(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
