"""Deduplication operators for large-scale corpus curation.

Reference parity: exact MD5 dedup (src/ir/index/deduplication.py:65-83,
content hash src/ir/index/doc_reader.py:71-94) and 64-bit SimHash with
Hamming ≤ 3 (deduplication.py:85-169; its O(M)-per-doc scan is replaced by
banded LSH, the approach its own comments point at :243-247).

Scale-first additions (a 100 TB curation pipeline needs these):
* MinHash + banded LSH over word shingles — built ENTIRELY from JVM
  expressions: shingle explode → min(xxhash64(seed_i, shingle)) per
  signature row → band keys → bucket self-join. No Python in the hot path.
* exact n-gram Jaccard verification via shingle self-join.
* SimHash fingerprints via an Arrow-batched pandas UDF (token hashing is
  Python, but one call per batch), candidate pairs via 16-bit bands and
  ``bit_count(h1 ^ h2)`` (JVM popcount) for the Hamming filter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..tokenize import py_tokenize, tokens_col


def _eager_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Materialize the (candidate-pair — small relative to the corpus)
    result, then release the cached intermediates so repeated calls in a
    long-lived session don't accumulate executor storage until LRU
    eviction. The returned DataFrame is itself persisted: the ONE handle
    the caller owns and should ``.unpersist()`` when done with it."""
    result = result.persist()
    result.count()
    for df in intermediates:
        df.unpersist()
    return result


# ----------------------------------------------------------------- exact
def content_hash_col(text=None):
    """MD5 content hash (reference doc_reader.py:71-94)."""
    return F.md5(F.col("text") if text is None else text)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest doc_id per identical content hash."""
    h = docs.withColumn("content_hash", content_hash_col(F.col(text_col)))
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, dup_count, min_doc_id) for groups with >1 member."""
    return (
        docs.withColumn("content_hash", content_hash_col(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(F.col(id_col)).alias("min_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


# ----------------------------------------------------------------- simhash
@F.pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit token-vote SimHash (semantics of deduplication.py:85-169:
    per-token 64-bit hash, tf-weighted bit votes, sign → bit)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = py_tokenize(t or "")
        if not toks:
            out[i] = 0
            continue
        votes = np.zeros(64, dtype=np.int64)
        counts: dict[str, int] = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        for tok, tf in counts.items():
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits.astype(bool), tf, -tf)
        fp = np.uint64(0)
        fp_bits = votes > 0
        fp = int(np.packbits(fp_bits.astype(np.uint8), bitorder="little").view("<u8")[0])
        out[i] = np.int64(np.uint64(fp).astype(np.int64))
    return pd.Series(out)


def md5_hash64_col(term) -> "F.Column":
    """64-bit int from the first 8 bytes of md5(term), little-endian —
    bit-identical to ``simhash64_udf``'s per-token hash and replicable in
    any engine with an md5() (the DuckDB oracle recomputes it from the hex
    digits), unlike Spark-private xxhash64. Pure JVM expressions: 8
    hex-pair conv()s OR-ed into one long (byte 7's shift into the sign bit
    wraps — only the bit pattern matters downstream)."""
    h = F.md5(term)
    out = F.lit(0).cast("long")
    for i in range(8):
        byte = F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("long")
        out = out.bitwiseOR(F.shiftleft(byte, 8 * i))
    return out


def simhash64_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """(doc_id, sim): 64-bit SimHash computed ENTIRELY JVM-side — the
    scale-path replacement for the per-row-Python ``simhash64_udf``.

    Plan: explode tokens → (doc_id, term, tf) counts → ``xxhash64(term)``
    → the 64 bit-votes become 64 conditional sums in ONE
    ``groupBy(doc_id)`` aggregation; the sign bits then assemble into the
    fingerprint with a bitwise-OR chain. Same vote semantics as the
    reference (deduplication.py:85-169: tf-weighted ±votes per bit, sign →
    bit); default hash fn is xxhash64 instead of md5, so fingerprints
    differ from the UDF numerically but identically in structure —
    ``hash_fn=md5_hash64_col`` restores bit-exact UDF/oracle parity.
    Token-less docs get no row (they cannot near-dup anything)."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", hash_fn("term"))
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, F.col("tf")
            ).otherwise(-F.col("tf"))
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = tf.groupBy("doc_id").agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = fp.bitwiseOR(F.shiftleft(bit, i))
    return agg.select("doc_id", fp.alias("sim"))


def simhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming: int = 3,
    bands: int = 4,
    jvm: bool = True,
    hash_fn=None,
) -> DataFrame:
    """Near-dup pairs by SimHash: 16-bit band buckets (any pair within
    Hamming ≤ 3 of 64 bits shares ≥1 of 4 bands by pigeonhole), verified
    with JVM popcount. → (doc_a, doc_b, hamming_dist). ``jvm=False`` keeps
    the pandas-UDF fingerprint as the reference-parity fallback;
    ``hash_fn`` forwards to :func:`simhash64_df` (md5_hash64_col makes the
    whole pipeline oracle-replicable)."""
    assert 64 % bands == 0
    width = 64 // bands
    if jvm:
        h = simhash64_df(docs, text_col, id_col, hash_fn=hash_fn).persist()
    else:
        h = docs.select(
            F.col(id_col).alias("doc_id"), simhash64_udf(F.col(text_col)).alias("sim")
        ).persist()
    mask = (1 << width) - 1
    banded = h.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("sim", i * width).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "sim", "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming_dist"),
        )
        .distinct()
        .filter(F.col("hamming_dist") <= hamming)
    )
    return _eager_release(pairs, h)


# ------------------------------------------------------------ minhash LSH
def shingles_df(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Distinct word k-gram shingles per doc — pure JVM (transform over a
    token-array slide)."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, k)),
            )
        ).alias("shingle"),
    ).filter(F.length("shingle") > 0)
    return sh.distinct()


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc_id, sig array<long>) — row i = min over shingles of
    xxhash64(i, shingle); all JVM-side."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = shingles.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded MinHash, verified with EXACT shingle
    Jaccard. → (doc_a, doc_b, jaccard)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sh = shingles_df(docs, text_col, id_col, k).persist()
    sig = minhash_signatures(sh, num_hashes)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(*[F.col("sig")[bi * rows + r] for r in range(rows)]).alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _eager_release(verify_jaccard(cand, sh, threshold), sh)


def verify_jaccard(pairs: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard ≥ threshold via shingle self-join
    (no LSH — the oracle-checkable baseline; LSH must find a superset).

    SCALE GUARD — ``max_shingle_df``: the self-join emits df² rows per
    shingle, so one boilerplate shingle shared by m docs costs m² join rows
    (quadratic blowup at corpus scale). Standard dedup practice drops
    hot shingles before the join: with ``max_shingle_df=t`` any shingle
    appearing in more than t docs is discarded from BOTH the pair
    candidates and the per-doc set sizes (so Jaccard stays a true set
    Jaccard over the surviving shingles). True near-dups share many rare
    shingles, so recall loss is confined to docs whose overlap is ONLY
    boilerplate. Default None = exact semantics — the sf0.01 oracle pins
    this path; big-corpus callers must set a cap.
    """
    sh = shingles_df(docs, text_col, id_col, k).persist()
    if max_shingle_df is not None:
        cold = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        # inner join on shingle (shuffle, no broadcast-size assumption —
        # the cold set is O(vocab) and can exceed driver memory at scale)
        sh_f = sh.join(cold, "shingle").persist()
        sh.unpersist()
        sh = sh_f
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return _eager_release(out, sh)


def dup_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup pair list → connected components: (doc_id, component),
    component = min doc_id reachable through dup edges.

    The dedup ENDGAME: pair detection (Jaccard/MinHash/SimHash/embedding)
    leaves transitive chains A~B~C that pairwise dropping mishandles;
    resolving components picks one canonical doc (the min id) per group.

    Algorithm: iterative min-label propagation — each round every vertex
    takes the min of its own label and its neighbors' labels; converges
    in O(component diameter) rounds (dup groups are near-cliques, so
    2-3 in practice), checked per round with an early-stop count. Each
    round is one broadcast-free join + groupBy on the EDGE table — the
    standard large-graph CC shape (label table ~ |V|, edge scan ~ |E|
    per round, no driver-side graph). Raises if max_iter rounds don't
    converge rather than returning a partial labeling. Like the other
    ops here, the returned labels DataFrame is persisted — the one
    caller-owned handle; ``.unpersist()`` it when done.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            prop = (
                edges.join(
                    labels.select(
                        F.col("doc_id").alias("src"),
                        F.col("component").alias("src_comp"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("src_comp").alias("nbr_comp"))
            )
            # localCheckpoint (eager), NOT persist: it CUTS lineage, so
            # round N's plan doesn't embed rounds 1..N-1 — without it the
            # logical plan doubles per round and Catalyst analysis time
            # explodes exponentially (classic iterative-Spark pitfall)
            new_labels = (
                labels.join(prop, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_comp", "component")
                    ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels
        labels.unpersist()  # error path: don't leak the last round's cache
        raise RuntimeError(
            f"dup_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()
