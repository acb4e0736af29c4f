"""Positional postings in compressed doc-range blocks — the 100 TB scale
path for phrase / proximity queries.

The flat positional table (``index/build.py`` build_positional, reference
src/ir/index/positional_index.py:92-152) answers phrase queries with one
doc_id equi-join per phrase term; correct, but at 10^12 turns every query
re-shuffles raw position rows. This module stores positions the way the
BM25 engine stores postings (``index/segments.py``): one compressed blob
per (term, block_key) with ``block_key = doc_id >> span_bits``, giving

* build: ONE shuffle keyed (term, block_key) — a hot term's positions
  split across doc-range groups, so no reducer ever holds a stopword's
  full position list (the same skew bound as the BM25 blocks);
* query: a k-term phrase needs NO join at all — every doc's positions
  for ALL terms share one block_key, so a single groupBy(block_key)
  kernel sees everything it needs; term pushdown (``term IN (...)``)
  reaches the block-table scan, and the work is embarrassingly parallel
  by doc range;
* storage: doc-gap + per-doc position-delta varint streams (positions
  are strictly increasing within a doc, so deltas are ≥ 1).

Blob layout (single varint stream; counts make it self-describing):
``gaps(n) ++ freqs(n) ++ pos-deltas(sum freqs)`` where ``gaps`` are
doc-id deltas from the block base and each doc's first position is
stored absolute, the rest as deltas.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .codec import varint_decode, varint_encode
from .segments import DEFAULT_SPAN_BITS

POS_BLOCK_SCHEMA = (
    "term string, block_key long, n int, min_doc long, max_doc long, "
    "n_pos long, nbytes int, data binary"
)

# doc_id*2^32 + pos phrase keys assume positions < 2^32 (a single doc
# shorter than 4Gi tokens — far above any real transcript turn)
_POS_BITS = 32


def encode_pos_block(
    doc_ids: np.ndarray, freqs: np.ndarray, pos_flat: np.ndarray, block_base: int
) -> bytes:
    """Sorted unique int64 doc_ids, per-doc occurrence counts, and the
    flat concatenated (per-doc sorted) positions → varint blob."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    f = np.ascontiguousarray(freqs, dtype=np.int64)
    p = np.ascontiguousarray(pos_flat, dtype=np.int64)
    gaps = np.empty(d.shape, dtype=np.uint64)
    if d.size:
        gaps[0] = np.uint64(int(d[0]) - int(block_base))
        np.subtract(d[1:], d[:-1], out=gaps[1:].view(np.int64))
    # per-doc position deltas: first position absolute, rest diffs
    deltas = np.empty(p.shape, dtype=np.int64)
    if p.size:
        deltas[0] = p[0]
        np.subtract(p[1:], p[:-1], out=deltas[1:])
        starts = np.zeros(p.size, dtype=bool)
        starts[np.cumsum(f[:-1])] = True
        starts[0] = True
        deltas[starts] = p[starts]
    stream = np.concatenate(
        [gaps, f.astype(np.uint64), deltas.astype(np.uint64)]
    )
    return varint_encode(stream).tobytes()


def decode_pos_block(data: bytes, n: int, block_base: int):
    """blob → (doc_ids int64, freqs int64, pos_flat int64). ``pos_flat``
    is the concatenation of each doc's sorted positions; doc i owns the
    slice [cumsum(freqs)[i-1], cumsum(freqs)[i])."""
    stream = varint_decode(np.frombuffer(data, dtype=np.uint8)).astype(np.int64)
    gaps = stream[:n]
    doc_ids = np.cumsum(gaps) + np.int64(block_base)
    freqs = stream[n : 2 * n]
    deltas = stream[2 * n :]
    assert deltas.size == int(freqs.sum()), "corrupt positional block"
    pos = np.cumsum(deltas)
    if n:
        # subtract the running carry at each doc start so each doc's
        # positions restart from its absolute first position
        starts = np.zeros(deltas.size, dtype=bool)
        starts[np.cumsum(freqs[:-1])] = True
        starts[0] = True
        carry = np.where(starts, pos - deltas, 0)
        carry = np.maximum.accumulate(carry)
        pos = pos - carry
    return doc_ids, freqs, pos


def build_positional_blocks(
    docs: DataFrame,
    span_bits: int = DEFAULT_SPAN_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents → positional block table (POS_BLOCK_SCHEMA). JVM
    posexplode feeds one applyInPandas encoder per (term, block_key)
    group — the only shuffle, with the doc-range key bounding hot-term
    groups at 2^span_bits docs."""

    rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    ).withColumn("block_key", F.shiftright("doc_id", span_bits))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        bk = int(pdf["block_key"].iloc[0])
        base = bk << span_bits
        d = pdf["doc_id"].to_numpy(np.int64)
        p = pdf["pos"].to_numpy(np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        uniq, freqs = np.unique(d, return_counts=True)
        blob = encode_pos_block(uniq, freqs, p, base)
        return pd.DataFrame(
            [
                (
                    term,
                    bk,
                    int(uniq.size),
                    int(uniq[0]),
                    int(uniq[-1]),
                    int(p.size),
                    len(blob),
                    blob,
                )
            ],
            columns=[
                "term",
                "block_key",
                "n",
                "min_doc",
                "max_doc",
                "n_pos",
                "nbytes",
                "data",
            ],
        )

    return rows.groupBy("term", "block_key").applyInPandas(
        kernel, schema=POS_BLOCK_SCHEMA
    )


def merge_positional_blocks(
    blocks: DataFrame, span_bits: int = DEFAULT_SPAN_BITS
) -> DataFrame:
    """Incremental add for the positional face (reference
    src/ir/index/incremental_builder.py semantics, mirroring
    ``segments.merge_segments``): segment block tables from separate
    builds are unioned and re-merged per (term, block_key) — straddling
    blocks decode, concatenate, re-sort by (doc_id, pos) and re-encode;
    blocks unique to one segment pass through untouched (cheap common
    case). Doc ids may interleave across segments; a doc appearing in
    two segments contributes the union of its occurrences."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf[
                [
                    "term", "block_key", "n", "min_doc", "max_doc",
                    "n_pos", "nbytes", "data",
                ]
            ]
        term = pdf["term"].iloc[0]
        bk = int(pdf["block_key"].iloc[0])
        base = bk << span_bits
        ds, ps = [], []
        for r in pdf.itertuples(index=False):
            d, f, p = decode_pos_block(r.data, int(r.n), base)
            ds.append(np.repeat(d, f))
            ps.append(p)
        d = np.concatenate(ds)
        p = np.concatenate(ps)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        uniq, freqs = np.unique(d, return_counts=True)
        blob = encode_pos_block(uniq, freqs, p, base)
        return pd.DataFrame(
            [
                (
                    term, bk, int(uniq.size), int(uniq[0]), int(uniq[-1]),
                    int(p.size), len(blob), blob,
                )
            ],
            columns=[
                "term", "block_key", "n", "min_doc", "max_doc",
                "n_pos", "nbytes", "data",
            ],
        )

    return blocks.groupBy("term", "block_key").applyInPandas(
        kernel, schema=POS_BLOCK_SCHEMA
    )


def phrase_match_blocks(blocks: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Blocked twin of ``query.phrase.phrase_match`` → (doc_id,
    match_count). The term filter pushes down to the block scan; one
    groupBy(block_key) kernel intersects positions fully vectorized:
    each occurrence becomes the key ``doc_id·2^32 + pos`` so the
    consecutive-offset check is a chain of np.isin calls across the
    whole block — no per-doc loop, no join."""
    if not terms:
        raise ValueError("empty phrase")
    uniq_terms = list(dict.fromkeys(terms))
    sub = blocks.filter(F.col("term").isin(uniq_terms))
    span_terms = list(terms)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "match_count": []}).astype(
            {"doc_id": "int64", "match_count": "int64"}
        )
        # decoding with base=0 yields BLOCK-RELATIVE doc ids (the first
        # gap is doc0 - block_base), which fit in span_bits — so the
        # (rel_doc << 32) + pos phrase key never overflows int64 even at
        # 10^12 absolute doc ids. The shared base is recovered once from
        # any row's stored absolute min_doc.
        keys: dict[str, np.ndarray] = {}
        base = None
        for r in pdf.itertuples(index=False):
            d_rel, f, p = decode_pos_block(r.data, int(r.n), 0)
            if base is None:
                base = int(r.min_doc) - int(d_rel[0])
            k = (np.repeat(d_rel, f) << _POS_BITS) + p
            keys[r.term] = np.concatenate([keys[r.term], k]) if r.term in keys else k
        if any(t not in keys for t in span_terms):
            return empty
        anchor = keys[span_terms[0]]
        for i, t in enumerate(span_terms[1:], start=1):
            anchor = anchor[np.isin(anchor + i, keys[t])]
            if not anchor.size:
                return empty
        rel_hit, counts = np.unique(anchor >> _POS_BITS, return_counts=True)
        return pd.DataFrame(
            {
                "doc_id": (rel_hit + base).astype(np.int64),
                "match_count": counts.astype(np.int64),
            }
        )

    return sub.groupBy("block_key").applyInPandas(
        kernel, schema="doc_id long, match_count long"
    )


def window_match_blocks(
    blocks: DataFrame, terms: Sequence[str], window: int
) -> DataFrame:
    """Blocked twin of ``query.phrase.window_match`` → (doc_id): exists
    one position per term with max-min < window. Mirrors the flat
    implementation's anchor rule exactly — anchoring at the minimum
    chosen position x, every other term needs a position in
    [x, x+window); any term may hold the minimum, so OR over anchors.
    Cost: k anchors × (k-1) terms × window np.isin probes — vectorized
    over every occurrence in the block at once."""
    if not terms:
        raise ValueError("empty window query")
    uniq = list(dict.fromkeys(terms))
    sub = blocks.filter(F.col("term").isin(uniq))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": []}).astype({"doc_id": "int64"})
        keys: dict[str, np.ndarray] = {}
        base = None
        for r in pdf.itertuples(index=False):
            d_rel, f, p = decode_pos_block(r.data, int(r.n), 0)
            if base is None:
                base = int(r.min_doc) - int(d_rel[0])
            k = (np.repeat(d_rel, f) << _POS_BITS) + p
            keys[r.term] = np.concatenate([keys[r.term], k]) if r.term in keys else k
        if any(t not in keys for t in uniq):
            return empty
        hits = []
        for a in uniq:
            xa = keys[a]
            ok = np.ones(xa.shape, dtype=bool)
            for t in uniq:
                if t is a:
                    continue
                any_in = np.zeros(xa.shape, dtype=bool)
                for d in range(window):
                    any_in |= np.isin(xa + d, keys[t])
                ok &= any_in
                if not ok.any():
                    break
            hits.append(xa[ok] >> _POS_BITS)
        docs_hit = np.unique(np.concatenate(hits))
        return pd.DataFrame({"doc_id": (docs_hit + base).astype(np.int64)})

    return sub.groupBy("block_key").applyInPandas(kernel, schema="doc_id long")


def proximity_match_blocks(
    blocks: DataFrame, t1: str, t2: str, n: int
) -> DataFrame:
    """Blocked twin of ``query.phrase.proximity_match`` (NEAR/n,
    positional_index.py:318-393) → (doc_id). Same no-join shape as the
    phrase kernel; the |Δpos| ≤ n check is 2n+1 vectorized np.isin
    probes over the doc-relative keys (a position offset can never cross
    a doc boundary — positions sit in the low 32 bits and real docs are
    far shorter than 2^32 - n tokens)."""
    sub = blocks.filter(F.col("term").isin(list({t1, t2})))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": []}).astype({"doc_id": "int64"})
        keys: dict[str, np.ndarray] = {}
        base = None
        for r in pdf.itertuples(index=False):
            d_rel, f, p = decode_pos_block(r.data, int(r.n), 0)
            if base is None:
                base = int(r.min_doc) - int(d_rel[0])
            k = (np.repeat(d_rel, f) << _POS_BITS) + p
            keys[r.term] = np.concatenate([keys[r.term], k]) if r.term in keys else k
        if t1 not in keys or t2 not in keys:
            return empty
        k1, k2 = keys[t1], keys[t2]
        hit = np.zeros(k1.shape, dtype=bool)
        for d in range(-n, n + 1):
            hit |= np.isin(k1 + d, k2)
        docs_hit = np.unique(k1[hit] >> _POS_BITS)
        return pd.DataFrame({"doc_id": (docs_hit + base).astype(np.int64)})

    return sub.groupBy("block_key").applyInPandas(kernel, schema="doc_id long")
