"""Blocked (compressed) index build, shuffle-aware segment merge,
hot-term skew handling, and resumable builds with per-partition lineage.

North-rule machinery (BASELINE.json): sharded posting lists with docID
delta + varint blocks; per-partition segment indexes merged via a
shuffle-aware merge; term-hash partitioning with doc-range sharding for
hot-term (stopword-frequency) skew; resumable from per-partition
checkpoints with lineage rows (partition id, term range, doc count, bytes,
wall time).

Key design: blocks are keyed by (term, block_key) where
``block_key = doc_id >> span_bits``. Effects:

* a hot term's postings split across many doc-range groups — THE salting
  strategy: no single reducer ever materializes a stopword's full posting
  list (bounded by 2^span_bits docs per group), cf. reference's monolithic
  per-term lists (src/ir/index/inverted_index.py:44-66);
* blocks stay doc_id-sorted globally (block_key is a prefix of doc_id),
  preserving the reference's sorted-postings invariant (:52-54) which
  powers both delta compression and DAAT merging;
* segment merge across builds is a groupBy(term, block_key) concat —
  sorted runs merge by construction;
* a document's postings for ALL terms share one block_key, so per-group
  BM25 scores are exact — the WAND kernel's per-group top-k is globally
  mergeable without rescoring.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenize import tokenizer
from .codec import decode_block, encode_block

DEFAULT_SPAN_BITS = 14  # ≤ 16384 docs per (term, block) group

BLOCK_SCHEMA = (
    "term string, block_key long, n int, min_doc long, max_doc long, "
    "max_tf int, min_dl int, nbytes int, data binary"
)


def _encode_groups(pdf: pd.DataFrame, span_bits: int) -> pd.DataFrame:
    """applyInPandas kernel: rows of one or more (term, block_key) groups →
    one encoded block row per group."""
    out = []
    for (term, bk), g in pdf.groupby(["term", "block_key"], sort=False):
        g = g.sort_values("doc_id", kind="mergesort")
        d = g["doc_id"].to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        dl = g["dl"].to_numpy(np.int64)
        base = int(bk) << span_bits
        blob = encode_block(d, tf, dl, base)
        out.append(
            (
                term,
                int(bk),
                len(d),
                int(d[0]),
                int(d[-1]),
                int(tf.max()),
                int(dl.min()),
                len(blob),
                blob,
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "term", "block_key", "n", "min_doc", "max_doc",
            "max_tf", "min_dl", "nbytes", "data",
        ],
    )


def build_blocked_postings(
    postings: DataFrame, span_bits: int = DEFAULT_SPAN_BITS
) -> DataFrame:
    """Flat postings (term, doc_id, tf, dl) → compressed block rows.

    One shuffle: groupBy(term, block_key). Hot terms fan out over doc
    ranges instead of hitting a single reducer.
    """
    blocked = postings.withColumn(
        "block_key", F.shiftright(F.col("doc_id"), span_bits)
    )
    return blocked.groupBy("term", "block_key").applyInPandas(
        lambda pdf: _encode_groups(pdf, span_bits), schema=BLOCK_SCHEMA
    )


def merge_segments(
    segments: DataFrame, span_bits: int = DEFAULT_SPAN_BITS
) -> DataFrame:
    """Shuffle-aware merge of per-segment block tables: same (term,
    block_key) from different segments decode → concat-sort → re-encode.
    Disjoint groups pass through untouched (the common case when segments
    partition the doc-id space)."""

    def remerge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (term, bk), g in pdf.groupby(["term", "block_key"], sort=False):
            base = int(bk) << span_bits
            if len(g) == 1:
                out.append(g)
                continue
            ds, tfs, dls = [], [], []
            for _, row in g.iterrows():
                d, tf, dl = decode_block(row["data"], row["n"], base)
                ds.append(d)
                tfs.append(tf)
                dls.append(dl)
            d = np.concatenate(ds)
            order = np.argsort(d, kind="mergesort")
            d = d[order]
            tf = np.concatenate(tfs)[order]
            dl = np.concatenate(dls)[order]
            blob = encode_block(d, tf, dl, base)
            out.append(
                pd.DataFrame(
                    [(term, int(bk), len(d), int(d[0]), int(d[-1]),
                      int(tf.max()), int(dl.min()), len(blob), blob)],
                    columns=g.columns,
                )
            )
        return pd.concat(out, ignore_index=True)

    return segments.groupBy("term", "block_key").applyInPandas(
        remerge, schema=BLOCK_SCHEMA
    )


def explode_blocks(blocks: DataFrame, span_bits: int = DEFAULT_SPAN_BITS) -> DataFrame:
    """Decode block rows back to flat postings (round-trip / debugging)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                base = int(row["block_key"]) << span_bits
                d, tf, dl = decode_block(row["data"], row["n"], base)
                outs.append(
                    pd.DataFrame(
                        {"term": row["term"], "doc_id": d, "tf": tf, "dl": dl}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.mapInPandas(gen, schema="term string, doc_id long, tf long, dl long")


# ---------------------------------------------------------- resumable build
def build_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    num_buckets: int = 8,
    span_bits: int = DEFAULT_SPAN_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer_mode: str = "fast",
) -> dict:
    """Checkpointed index build: the corpus is split into ``num_buckets``
    doc-hash buckets; each bucket builds + writes its block segment and
    appends a lineage row. A restart skips buckets already recorded in the
    lineage log (semantics of the reference's incremental checkpoint,
    src/ir/index/incremental_builder.py:508-567, re-expressed as
    partition-level idempotent batch jobs).

    Returns the lineage summary dict.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    lineage_path = out / "lineage.jsonl"
    done = set()
    if lineage_path.exists():
        for line in lineage_path.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("status") == "ok":
                done.add(rec["bucket"])
    tok = tokenizer(tokenizer_mode)
    for b in range(num_buckets):
        if b in done:
            continue
        t0 = time.time()
        subset = docs.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)) == b
        )
        toks = subset.select(
            F.col(id_col).alias("doc_id"), tok(text_col).alias("tokens")
        )
        flat = (
            toks.select(
                "doc_id", F.size("tokens").alias("dl"), F.explode("tokens").alias("term")
            )
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").cast("int").alias("tf"))
            .select("term", "doc_id", "tf", "dl")
        )
        blocks = build_blocked_postings(flat, span_bits)
        seg_path = str(out / "segments" / f"bucket={b}")
        blocks.write.mode("overwrite").parquet(seg_path)
        stats = spark.read.parquet(seg_path).agg(
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum("nbytes").alias("bytes"),
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
            F.countDistinct("term").alias("n_terms"),
        ).first()
        doc_count = subset.count()
        rec = {
            "bucket": b,
            "status": "ok",
            "doc_count": doc_count,
            "n_blocks": stats["n_blocks"],
            "n_postings": int(stats["n_postings"] or 0),
            "bytes": int(stats["bytes"] or 0),
            "term_range": [stats["term_min"], stats["term_max"]],
            "n_terms": stats["n_terms"],
            "wall_time_sec": round(time.time() - t0, 3),
        }
        with lineage_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
    lines = [json.loads(x) for x in lineage_path.read_text().splitlines()]
    return {
        "buckets": len(lines),
        "docs": sum(r["doc_count"] for r in lines),
        "postings": sum(r["n_postings"] for r in lines),
        "bytes": sum(r["bytes"] for r in lines),
        "lineage": str(lineage_path),
    }


def load_merged_blocks(spark: SparkSession, out_dir: str, span_bits: int = DEFAULT_SPAN_BITS) -> DataFrame:
    """Read all segment parquet and produce the merged block table."""
    seg = spark.read.parquet(str(Path(out_dir) / "segments"))
    return merge_segments(seg.drop("bucket"), span_bits)
