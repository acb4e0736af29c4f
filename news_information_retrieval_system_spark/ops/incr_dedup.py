"""Incremental cross-snapshot dedup: a NEW ingest batch vs the stored
corpus artifact.

Reference parity: the reference's DuplicateDetector is exactly this —
an incremental detector with persisted state
(src/ir/index/deduplication.py:204-224 add_exact/add_fuzzy into `seen`
sets, :260-298 is_exact_duplicate / is_fuzzy_duplicate / is_duplicate
checks against that state, :403-425 save/load the state file), and the
ingest path dedups per-record against seen hashes, first occurrence
winning (document_service.py:111-143 `seen_hashes`). ops/dedup.py covers
the one-shot whole-corpus shapes; THIS module is the continuous-ingest
shape a 100 TB pipeline actually runs: never re-dedup the corpus per
refresh — check each new batch against (a) the stored hash/fingerprint
tables and (b) itself, then append survivors + their signatures.

Spark shape: the corpus state is two persisted DataFrames (content-hash
table for exact, SimHash fingerprint table for fuzzy) instead of a
driver-side set — O(corpus) rows but never rescanned text. Exact check =
one equi-join on the 128-bit hash (uniform key, no skew) + one in-batch
window; fuzzy check = banded fingerprint join (pigeonhole: Hamming ≤
bands-1 over 64/bands-bit bands guarantees a shared band) verified with
JVM ``bit_count`` popcount — the batch side is tiny relative to the
corpus, so AQE broadcasts it and the corpus band table streams through
map-side.

Determinism: in-batch ties break on doc_id asc (first-seen-wins, the
reference's sequential-scan order); all hashing is md5-derived and
replicable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import content_hash_col, simhash64_df


def corpus_hash_state(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ distinct (content_hash): the exact-dedup corpus artifact
    (DuplicateDetector.seen_hashes, deduplication.py:204-222, as a
    persisted table)."""
    return docs.select(
        content_hash_col(F.col(text_col)).alias("content_hash")
    ).distinct()


def incremental_exact_dedup(
    batch: DataFrame,
    corpus_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, content_hash, dup_of_corpus, dup_in_batch, kept):
    per-batch-row exact-duplicate flags vs the corpus state AND the
    batch itself (first occurrence by ``id_col`` asc wins, the
    reference's sequential seen-set order). ``kept = 1`` rows (and their
    hashes) are what a pipeline appends to the corpus + state tables."""
    hashed = batch.select(
        F.col(id_col).alias("doc_id"),
        content_hash_col(F.col(text_col)).alias("content_hash"),
    )
    in_corpus = hashed.join(
        corpus_hashes.select(
            "content_hash", F.lit(1).alias("_corpus")
        ).distinct(),
        "content_hash",
        "left",
    )
    w = Window.partitionBy("content_hash").orderBy(F.asc("doc_id"))
    flagged = in_corpus.withColumn("_rn", F.row_number().over(w)).select(
        "doc_id",
        "content_hash",
        F.when(F.col("_corpus").isNotNull(), 1).otherwise(0).alias(
            "dup_of_corpus"
        ),
        F.when(F.col("_rn") > 1, 1).otherwise(0).alias("dup_in_batch"),
    )
    return flagged.withColumn(
        "kept",
        F.when(
            (F.col("dup_of_corpus") == 0) & (F.col("dup_in_batch") == 0), 1
        ).otherwise(0),
    )


def corpus_simhash_state(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """→ (doc_id, sim): the fuzzy-dedup corpus artifact
    (DuplicateDetector.seen_simhashes, deduplication.py:224-258, as a
    persisted fingerprint table). ``hash_fn=md5_hash64_col`` makes the
    fingerprints replicable in an independent SQL engine."""
    return simhash64_df(docs, text_col=text_col, id_col=id_col, hash_fn=hash_fn)


def incremental_simhash_dedup(
    batch: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming: int = 3,
    bands: int = 4,
    hash_fn=None,
) -> DataFrame:
    """→ (batch_id, corpus_id, hamming_dist): fuzzy matches of new batch
    docs against the stored corpus fingerprint table — the reference's
    is_fuzzy_duplicate scan (deduplication.py:276-298, default
    fuzzy_threshold=3) without its O(corpus) per-doc loop: banded buckets
    bound the comparison set (Hamming ≤ bands-1 over 64/bands-bit bands
    shares ≥1 band by pigeonhole; default bands=4 covers the default
    threshold 3), popcount verifies. A batch doc with NO output row is
    fuzzy-fresh; matched rows report every corpus neighbor within
    ``hamming``."""
    if hamming > bands - 1:
        raise ValueError(
            f"bands={bands} only guarantees Hamming <= {bands - 1}; "
            f"raise bands for hamming={hamming}"
        )
    if 64 % bands != 0:
        # a non-divisor would silently leave the high 64 % bands bits of
        # every fingerprint out of all band keys (missed candidates), so
        # fail loudly like the pigeonhole guard above — not via assert,
        # which python -O strips
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1

    def banded(fps: DataFrame, out_id: str) -> DataFrame:
        return fps.select(
            F.col("doc_id").alias(out_id),
            F.col("sim").alias(f"_sim_{out_id}"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sim", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ])
            ).alias("bk"),
        ).select(out_id, f"_sim_{out_id}", "bk.band", "bk.key")

    batch_fps = simhash64_df(
        batch, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    )
    hits = (
        banded(batch_fps, "batch_id")
        .join(banded(corpus_fps, "corpus_id"), ["band", "key"])
        .select(
            "batch_id",
            "corpus_id",
            F.bit_count(
                F.col("_sim_batch_id").bitwiseXOR(F.col("_sim_corpus_id"))
            ).alias("hamming_dist"),
        )
        .distinct()
        .filter(F.col("hamming_dist") <= hamming)
    )
    return hits
