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
from .codec import (
    BLOCK_CODECS,
    decode_block,
    encode_block,
    varint_byte_lengths,
    varint_encode,
)

DEFAULT_SPAN_BITS = 14  # ≤ 16384 docs per (term, block) group

BLOCK_SCHEMA = (
    "term string, block_key long, n int, min_doc long, max_doc long, "
    "max_tf int, min_dl int, nbytes int, data binary"
)


def _encode_partition(
    batches: Iterator[pd.DataFrame], span_bits: int, codec: str = "varint"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: ONE call per partition (not per group — per-group
    Arrow round-trips were ~500µs each, dominating encode time for small
    groups). Rows arrive hash-partitioned by (tid, tid2, block_key) and
    sorted by (tid, tid2, block_key, doc_id); ONLY fixed-width ints cross
    the Arrow boundary (string terms cost ~20s/40M rows in Python object
    materialization — they're re-attached JVM-side afterwards). The whole
    partition is varint-encoded in one vectorized pass and sliced into
    per-group blobs by precomputed byte offsets."""
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    tid = pdf["tid"].to_numpy(np.int64)
    tid2 = pdf["tid2"].to_numpy(np.int64)
    bk = pdf["block_key"].to_numpy(np.int64)
    d = pdf["doc_id"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.int64)
    dl = pdf["dl"].to_numpy(np.int64)
    n = len(d)
    new = np.ones(n, dtype=bool)
    new[1:] = (tid[1:] != tid[:-1]) | (tid2[1:] != tid2[:-1]) | (bk[1:] != bk[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    sizes = ends - starts
    if codec == "varint":
        gid = np.repeat(np.arange(starts.size), sizes)
        gaps = np.empty(n, dtype=np.uint64)
        if n > 1:
            gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        gaps[starts] = (d[starts] - (bk[starts] << span_bits)).astype(np.uint64)
        # interleave per group: [gaps | tfs | dls], groups contiguous
        within = np.arange(n, dtype=np.int64) - starts[gid]
        pos_g = 3 * starts[gid] + within
        pos_t = pos_g + sizes[gid]
        pos_l = pos_t + sizes[gid]
        stream = np.empty(3 * n, dtype=np.uint64)
        stream[pos_g] = gaps
        stream[pos_t] = tf.astype(np.uint64)
        stream[pos_l] = dl.astype(np.uint64)
        enc = varint_encode(stream).tobytes()
        nb = varint_byte_lengths(stream)
        gbytes = np.add.reduceat(nb, 3 * starts)
        bends = np.cumsum(gbytes)
        bstarts = bends - gbytes
        data = [enc[s:e] for s, e in zip(bstarts, bends)]
        gbytes = gbytes.astype(np.int32)
    else:
        # alternate codecs (e.g. pfor) pick parameters PER GROUP (frame
        # width b), so the one-pass whole-partition encode doesn't apply;
        # per-group numpy encodes instead (each group's inner work stays
        # vectorized).
        enc_fn = BLOCK_CODECS[codec][0]
        data = [
            enc_fn(d[s:e], tf[s:e], dl[s:e], int(bk[s]) << span_bits)
            for s, e in zip(starts, ends)
        ]
        gbytes = np.array([len(x) for x in data], dtype=np.int32)
    yield pd.DataFrame(
        {
            "tid": tid[starts],
            "tid2": tid2[starts],
            "block_key": bk[starts],
            "n": sizes.astype(np.int32),
            "min_doc": d[starts],
            "max_doc": d[ends - 1],
            "max_tf": np.maximum.reduceat(tf, starts).astype(np.int32),
            "min_dl": np.minimum.reduceat(dl, starts).astype(np.int32),
            "nbytes": gbytes,
            "data": data,
        }
    )


_TID_BLOCK_SCHEMA = (
    "tid long, tid2 long, block_key long, n int, min_doc long, max_doc long, "
    "max_tf int, min_dl int, nbytes int, data binary"
)


def _merge_tid_partition(
    batches: Iterator[pd.DataFrame], span_bits: int, codec: str = "varint"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel merging duplicate (tid, tid2, block_key) block
    fragments within a partition. Rows arrive hash-partitioned by the key
    triple and sorted by (tid, tid2, block_key, min_doc). Singleton groups
    (the overwhelming majority when the input was doc-range clustered)
    pass through WITHOUT decoding — pure memcpy; only straddler groups
    decode → concat (already doc-sorted across fragments) → re-encode,
    which reproduces the exact bytes a one-shot group encode would emit."""
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    tid = pdf["tid"].to_numpy(np.int64)
    tid2 = pdf["tid2"].to_numpy(np.int64)
    bk = pdf["block_key"].to_numpy(np.int64)
    n = len(tid)
    new = np.ones(n, dtype=bool)
    new[1:] = (tid[1:] != tid[:-1]) | (tid2[1:] != tid2[:-1]) | (bk[1:] != bk[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    singleton = (ends - starts) == 1
    out = [pdf.iloc[starts[singleton]]]
    dup_groups = np.flatnonzero(~singleton)
    if dup_groups.size:
        enc_fn, dec_fn = BLOCK_CODECS[codec]
        data = pdf["data"].to_numpy(object)
        nrow = pdf["n"].to_numpy(np.int64)
        rows = []
        for g in dup_groups:
            s, e = starts[g], ends[g]
            base = int(bk[s]) << span_bits
            ds, tfs, dls = [], [], []
            for i in range(s, e):
                d, tf, dl = dec_fn(data[i], int(nrow[i]), base)
                ds.append(d)
                tfs.append(tf)
                dls.append(dl)
            d = np.concatenate(ds)
            order = np.argsort(d, kind="mergesort")
            d = d[order]
            tf = np.concatenate(tfs)[order]
            dl = np.concatenate(dls)[order]
            blob = enc_fn(d, tf, dl, base)
            rows.append(
                (int(tid[s]), int(tid2[s]), int(bk[s]), len(d), int(d[0]),
                 int(d[-1]), int(tf.max()), int(dl.min()), len(blob), blob)
            )
        out.append(pd.DataFrame(rows, columns=pdf.columns))
    yield pd.concat(out, ignore_index=True)


def build_blocked_postings(
    postings: DataFrame,
    span_bits: int = DEFAULT_SPAN_BITS,
    num_partitions: int | None = None,
    term_dict: DataFrame | None = None,
    raw_shuffle: bool | None = None,
    overlap_threshold: float = 2.0,
    codec: str = "varint",
) -> DataFrame:
    """Flat postings (term, doc_id, tf, dl) → compressed block rows.

    Segment-then-merge plan (the Lucene-style shape): each input
    partition sorts locally and encodes its own blocks (NO raw-row
    shuffle), producing per-partition SEGMENTS; only the ~10-50× smaller
    encoded block rows are then term-hash shuffled, and fragments of a
    (term, block_key) group that straddled partitions merge in a
    vectorized kernel (singletons pass through as memcpy). Output is
    byte-identical to a one-shot global group encode. When the input is
    doc-range clustered (dense doc_ids written in order — the engine's
    ingest layout), almost every group is a singleton and the shuffled
    volume is just the compressed index. Scattered input stays CORRECT
    but fragments heavily; there ``raw_shuffle=True`` shuffles the raw
    rows once up front instead (the v1 plan).

    ``raw_shuffle=None`` (default) AUTO-SELECTS:

    * **local masters → raw_shuffle.** On ``local[N]`` a shuffle is an
      intra-process memcpy, so segment-merge's smaller shuffle volume
      buys nothing while its second Python pass costs a full extra
      decode/merge. Measured (interleaved min-of-N, same cached
      postings): raw 3.76s vs merge 4.99s at 200k turns/local[32], and
      raw 37.6s vs merge 59.3s at 4M turns/pinned local[8] — raw wins
      at both parallelism levels and both corpus sizes.
    * **cluster masters → layout probe.** Over a network, shuffling the
      ~10-50× smaller encoded blocks instead of raw postings is the
      win segment-merge exists for — IF the input is doc-range
      clustered (else every group fragments). One narrow probe job
      computes each input partition's doc-id span; overlap factor =
      Σ per-partition spans / global span ≈ 1 for clustered input,
      ≈ n_partitions for scattered — above ``overlap_threshold`` the
      raw-shuffle plan wins because nearly every (term, block_key)
      group would fragment across partitions. The probe re-runs the
      postings subtree once, so call it with postings cached (the
      normal build flow materializes them first) or pass the plan
      explicitly.

    Either way, hot terms fan out over doc ranges instead of hitting a
    single reducer. Terms traverse the Python kernels as a 128-bit hash
    pair (tid, tid2) = xxhash64(term) ⊕ xxhash64(1, term) — collision odds
    ~2^-128-scale even at billions of terms — and the string is
    re-attached with a JVM join afterwards. NOTE: doc-range blocking
    presumes DENSE doc_ids (docids.with_doc_ids method='dense'); sparse
    hash ids degenerate to one-posting blocks.
    """
    blocked = postings.select(
        F.xxhash64("term").alias("tid"),
        F.xxhash64(F.lit(1), F.col("term")).alias("tid2"),
        F.shiftright(F.col("doc_id"), span_bits).alias("block_key"),
        "doc_id", "tf", "dl",
    )
    # follow the session's shuffle-partition sizing (data-dependent), not
    # the core count — shuffles' plan shape must not change between
    # parallelism levels of a scaling comparison
    parts = num_partitions or int(
        postings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if raw_shuffle is None:
        if postings.sparkSession.sparkContext.master.startswith("local"):
            raw_shuffle = True  # shuffle is memcpy-cheap; see docstring
        else:
            prof = (
                blocked.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
                .collect()
            )
            if prof:
                g_lo = min(r["lo"] for r in prof)
                g_hi = max(r["hi"] for r in prof)
                span_sum = sum(r["hi"] - r["lo"] + 1 for r in prof)
                overlap = span_sum / max(g_hi - g_lo + 1, 1)
                raw_shuffle = overlap > overlap_threshold
            else:
                raw_shuffle = False
    if raw_shuffle:
        enc = (
            blocked.repartition(parts, "tid", "tid2", "block_key")
            .sortWithinPartitions("tid", "tid2", "block_key", "doc_id")
            .mapInPandas(
                lambda it: _encode_partition(it, span_bits, codec),
                schema=_TID_BLOCK_SCHEMA,
            )
        )
    else:
        seg = blocked.sortWithinPartitions(
            "tid", "tid2", "block_key", "doc_id"
        ).mapInPandas(
            lambda it: _encode_partition(it, span_bits, codec),
            schema=_TID_BLOCK_SCHEMA,
        )
        enc = (
            seg.repartition(parts, "tid", "tid2", "block_key")
            .sortWithinPartitions("tid", "tid2", "block_key", "min_doc")
            .mapInPandas(
                lambda it: _merge_tid_partition(it, span_bits, codec),
                schema=_TID_BLOCK_SCHEMA,
            )
        )
    # term-id → term string map for re-attachment after the int-only kernel.
    # Pass the (tiny, already-materialized) term dictionary when you have
    # one — e.g. FulltextIndex.term_stats — otherwise this costs a full
    # distinct() pass over the postings table.
    src = term_dict if term_dict is not None else postings
    term_map = src.select(
        "term",
        F.xxhash64("term").alias("tid"),
        F.xxhash64(F.lit(1), F.col("term")).alias("tid2"),
    ).distinct()
    return enc.join(term_map, ["tid", "tid2"]).select(
        "term", "block_key", "n", "min_doc", "max_doc",
        "max_tf", "min_dl", "nbytes", "data",
    )


def merge_segments(
    segments: DataFrame, span_bits: int = DEFAULT_SPAN_BITS, codec: str = "varint"
) -> DataFrame:
    """Shuffle-aware merge of per-segment block tables: same (term,
    block_key) from different segments decode → concat-sort → re-encode.
    Disjoint groups pass through untouched (the common case when segments
    partition the doc-id space)."""

    enc_fn, dec_fn = BLOCK_CODECS[codec]

    def remerge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (term, bk), g in pdf.groupby(["term", "block_key"], sort=False):
            base = int(bk) << span_bits
            if len(g) == 1:
                out.append(g)
                continue
            ds, tfs, dls = [], [], []
            for _, row in g.iterrows():
                d, tf, dl = dec_fn(row["data"], row["n"], base)
                ds.append(d)
                tfs.append(tf)
                dls.append(dl)
            d = np.concatenate(ds)
            order = np.argsort(d, kind="mergesort")
            d = d[order]
            tf = np.concatenate(tfs)[order]
            dl = np.concatenate(dls)[order]
            blob = enc_fn(d, tf, dl, base)
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


def index_from_blocks(
    blocks: DataFrame,
    docs: DataFrame,
    span_bits: int = DEFAULT_SPAN_BITS,
    codec: str = "varint",
):
    """Hydrate a queryable FulltextIndex from a (possibly merged) block
    table: decode → flat postings, then re-derive df/idf/dl/avgdl — the
    reference's ``finalize()`` (incremental_builder.py:456-470) over
    segment-built indexes. ``docs`` supplies n_docs (token-less docs count
    toward avgdl's denominator, matching build_index) and hydration.
    Append ≡ rebuild: an index hydrated from merged segments reproduces
    the flat full-corpus build's rankings exactly (driver entry
    ``incremental_bm25`` checks this against the full-corpus oracle)."""
    from pyspark.sql import functions as F2

    from .build import FulltextIndex

    postings = explode_blocks(blocks, span_bits, codec)
    term_agg = postings.groupBy("term").agg(
        F2.count("*").alias("df"), F2.sum("tf").alias("_ttf")
    )
    stats = (
        term_agg.agg(F2.sum("_ttf").alias("_total_tokens"))
        .join(docs.agg(F2.count("*").alias("n_docs")), how="cross")
        .select("n_docs", (F2.col("_total_tokens") / F2.col("n_docs")).alias("avgdl"))
    )
    term_stats = (
        term_agg.join(F2.broadcast(stats), how="cross")
        .withColumn(
            "idf",
            F2.log(
                F2.lit(1.0)
                + (F2.col("n_docs") - F2.col("df") + 0.5) / (F2.col("df") + 0.5)
            ),
        )
        .select("term", "df", "idf")
    )
    doc_stats = postings.groupBy("doc_id").agg(F2.max("dl").alias("dl"))
    return FulltextIndex(postings, term_stats, doc_stats, stats, docs, term_agg)


def explode_blocks(
    blocks: DataFrame, span_bits: int = DEFAULT_SPAN_BITS, codec: str = "varint"
) -> DataFrame:
    """Decode block rows back to flat postings (round-trip / debugging)."""
    dec_fn = BLOCK_CODECS[codec][1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                base = int(row["block_key"]) << span_bits
                d, tf, dl = dec_fn(row["data"], row["n"], base)
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
    # Stage the input ONCE, hive-partitioned by bucket: each bucket job then
    # scans only its own partition directory (partition pruning) instead of
    # re-scanning the whole corpus num_buckets times. Idempotent: the staged
    # copy is reused on restart — but ONLY when it was staged from the same
    # build configuration. A manifest (doc count + corpus content hash +
    # bucketing/tokenizer params) guards the reuse: a restart with different
    # docs or num_buckets would otherwise silently read a stale staging
    # whose bucket membership disagrees with the lineage log.
    staged = out / "staged_input"
    manifest_path = out / "staging_manifest.json"
    corpus_sig = docs.select(
        F.count("*").alias("n"),
        # order-insensitive content signature: SIGNED SUM of per-row
        # xxhash64 % 1000000007 (Spark's % keeps the sign of negative
        # hashes — any independent re-implementation, e.g. a DuckDB
        # oracle, must reproduce the signed-remainder semantics)
        F.expr(f"cast(sum(xxhash64({id_col}, {text_col}) % 1000000007) as long)").alias("sig"),
    ).first()
    manifest = {
        "n_docs": corpus_sig["n"],
        "corpus_sig": int(corpus_sig["sig"] or 0),
        "num_buckets": num_buckets,
        "id_col": id_col,
        "text_col": text_col,
        "tokenizer_mode": tokenizer_mode,
    }
    stale = True
    if (staged / "_SUCCESS").exists() and manifest_path.exists():
        stale = json.loads(manifest_path.read_text()) != manifest
        if stale and done:
            raise ValueError(
                "build_resumable: staged input at "
                f"{staged} was built from a different corpus/configuration "
                f"than this call, but {len(done)} bucket(s) are already "
                "recorded in the lineage log. Refusing to mix: use a fresh "
                "out_dir (or delete the lineage log to rebuild)."
            )
    if stale:
        (
            docs.withColumn(
                "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
            )
            .repartition(num_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(str(staged))
        )
        manifest_path.write_text(json.dumps(manifest))
    spark_ref = docs.sparkSession
    tok = tokenizer(tokenizer_mode)
    for b in range(num_buckets):
        if b in done:
            continue
        t0 = time.time()
        subset = spark_ref.read.parquet(str(staged)).filter(F.col("bucket") == b)
        toks = subset.select(
            F.col(id_col).alias("doc_id"), tok(text_col).alias("tokens")
        )
        from .build import flat_postings

        flat = flat_postings(toks)
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


def plan_compaction(
    lineage_rows: list[dict],
    max_per_tier: int = 4,
    tier_factor: int = 8,
    floor_bytes: int = 1 << 20,
) -> list[list[int]]:
    """Size-tiered compaction plan over live lineage rows (the classic
    LSM policy Lucene-style engines run after many incremental appends):
    tier(segment) = floor(log_{tier_factor}(max(bytes, floor)/floor));
    any tier holding more than ``max_per_tier`` live segments merges ALL
    of them into one. Pure metadata logic over the lineage log — O(num
    segments), no Spark. Returns bucket-id groups, smallest tier first
    (small merges are cheap and free the most segment count).
    """
    import math

    live: dict[int, dict] = {}
    for r in lineage_rows:
        if r.get("status") == "ok":
            live[r["bucket"]] = r
        elif r.get("status") == "superseded":
            live.pop(r["bucket"], None)
    tiers: dict[int, list[int]] = {}
    for b, r in live.items():
        size = max(int(r.get("bytes", 0)), floor_bytes)
        t = int(math.log(size / floor_bytes) / math.log(tier_factor))
        tiers.setdefault(t, []).append(b)
    return [sorted(v) for _, v in sorted(tiers.items()) if len(v) > max_per_tier]


def compact_segments_dir(
    spark: SparkSession,
    out_dir: str,
    max_per_tier: int = 4,
    tier_factor: int = 8,
    floor_bytes: int = 1 << 20,
    span_bits: int = DEFAULT_SPAN_BITS,
) -> dict:
    """Execute a size-tiered compaction over a ``build_resumable`` output
    directory: each planned group's segments are union-read, re-merged
    block-wise (``merge_segments``), written as ONE new segment, and the
    lineage log is extended append-only — 'superseded' rows retire the
    inputs, one 'ok' row (with ``merged_from``) records the output.
    Semantically idempotent: ``load_merged_blocks`` returns the same
    merged block table before and after (the equality test pins this);
    what compaction buys is segment COUNT — query-time merge work and
    per-segment open cost scale with live segments.

    Filesystem note: directory swap is local-FS rename/delete here; on a
    real deployment this step is an Iceberg rewrite-files commit (atomic
    snapshot swap), same plan shape.
    """
    import shutil

    out = Path(out_dir)
    lineage_path = out / "lineage.jsonl"
    rows = [json.loads(x) for x in lineage_path.read_text().splitlines()]
    groups = plan_compaction(rows, max_per_tier, tier_factor, floor_bytes)
    live_ids = {r["bucket"] for r in rows if r.get("status") == "ok"}
    for r in rows:
        if r.get("status") == "superseded":
            live_ids.discard(r["bucket"])
    next_id = max(live_ids, default=-1) + 1
    merged_groups = []
    for group in groups:
        t0 = time.time()
        seg = spark.read.parquet(str(out / "segments")).filter(
            F.col("bucket").isin(group)
        )
        merged = merge_segments(seg.drop("bucket"), span_bits)
        tmp = out / "segments_compact_tmp"
        merged.write.mode("overwrite").parquet(str(tmp))
        stats = spark.read.parquet(str(tmp)).agg(
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum("nbytes").alias("bytes"),
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
            F.countDistinct("term").alias("n_terms"),
        ).first()
        for b in group:
            shutil.rmtree(out / "segments" / f"bucket={b}")
        (tmp).rename(out / "segments" / f"bucket={next_id}")
        doc_count = sum(
            r["doc_count"] for r in rows
            if r.get("status") == "ok" and r["bucket"] in group
        )
        with lineage_path.open("a") as f:
            for b in group:
                f.write(json.dumps(
                    {"bucket": b, "status": "superseded", "into": next_id}
                ) + "\n")
            f.write(json.dumps({
                "bucket": next_id,
                "status": "ok",
                "merged_from": group,
                "doc_count": doc_count,
                "n_blocks": stats["n_blocks"],
                "n_postings": int(stats["n_postings"] or 0),
                "bytes": int(stats["bytes"] or 0),
                "term_range": [stats["term_min"], stats["term_max"]],
                "n_terms": stats["n_terms"],
                "wall_time_sec": round(time.time() - t0, 3),
            }) + "\n")
        merged_groups.append({"merged_from": group, "into": next_id})
        next_id += 1
    n_live = len(live_ids) - sum(len(g["merged_from"]) for g in merged_groups) + len(merged_groups)
    return {"groups": merged_groups, "live_segments": n_live}
