"""Posting-block codec: docID delta + varint, numpy-vectorized.

Semantics follow the reference's VByte/gap encoding
(src/ir/index/compression.py:73-257 — little-endian base-128 varint with
continuation MSB, gap encoding of sorted doc_ids), re-implemented as
vectorized numpy kernels so Arrow-batched UDFs encode/decode thousands of
blocks per call with no per-row Python. PForDelta can slot in behind the
same ``encode_block``/``decode_block`` interface (codec is pluggable per
SURVEY.md §7 risk notes).

Block layout (one blob per (term, block_key) group):
    varint stream of 3n values:
        n   doc-id deltas  (first is doc_id[0] - block_base, then diffs)
        n   tfs
        n   dls
    where block_base = block_key << span_bits. Sorted-unique doc_ids per
    block → all deltas non-negative and < 2^span_bits.

Per-block metadata kept as columns (n, min/max doc_id, max_tf, min_dl)
powers block-max WAND upper bounds: UB(t) = score(max_tf, min_dl), the
reference's term upper bound (src/ir/retrieval/query_optimization.py:164-189)
tightened per block.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)


def varint_byte_lengths(vals: np.ndarray) -> np.ndarray:
    """Bytes each value will occupy in the varint stream."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return nb


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """uint64 array → uint8 varint stream (little-endian base-128,
    continuation MSB set on all but the last byte of each value)."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        idx = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """uint8 varint stream → uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (b & 0x80) > 0
    is_last = ~cont
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    value_idx = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    offset = np.arange(b.size, dtype=np.int64) - starts[value_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * offset.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_base: int
) -> bytes:
    """Sorted unique int64 doc_ids (+ parallel tf/dl) → delta+varint blob."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty(d.shape, dtype=np.uint64)
    if d.size:
        gaps[0] = np.uint64(int(d[0]) - int(block_base))
        np.subtract(d[1:], d[:-1], out=gaps[1:].view(np.int64))
    stream = np.concatenate(
        [gaps, np.asarray(tfs, dtype=np.uint64), np.asarray(dls, dtype=np.uint64)]
    )
    return varint_encode(stream).tobytes()


def decode_block(data: bytes, n: int, block_base: int):
    """blob → (doc_ids int64, tfs int64, dls int64)."""
    stream = varint_decode(np.frombuffer(data, dtype=np.uint8))
    assert stream.size == 3 * n, f"corrupt block: {stream.size} != 3*{n}"
    gaps = stream[:n].astype(np.int64)
    doc_ids = np.cumsum(gaps) + np.int64(block_base)
    tfs = stream[n : 2 * n].astype(np.int64)
    dls = stream[2 * n :].astype(np.int64)
    return doc_ids, tfs, dls


def compression_ratio(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int) -> float:
    """vs the reference's 4-byte-per-int baseline (compression.py:642-699)."""
    raw = 4 * 3 * len(doc_ids)
    enc = len(encode_block(doc_ids, tfs, dls, base))
    return enc / raw if raw else 1.0
