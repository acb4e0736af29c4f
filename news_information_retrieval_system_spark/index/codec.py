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


# ------------------------------------------------- Elias Gamma / Delta
# Reference semantics (src/ir/index/compression.py:260-639):
#   gamma(n) = 0^L ++ binary(n),  L = bit_length(n) - 1  → 2L+1 bits, and
#     the code read as an unsigned MSB-first field of width 2L+1 IS n.
#   delta(n) = gamma(bit_length(n)) ++ low (bit_length(n)-1) bits of n.
# Both are therefore "write value v in a w-bit MSB-first field", which a
# generic vectorized bit-packer handles with no per-value Python in the
# encode path. n ≥ 1 required (the reference raises on 0).


def gamma_bit_lengths(vals: np.ndarray) -> np.ndarray:
    """Bits gamma(n) occupies: 2*floor(log2 n) + 1. Matches the JVM column
    form ``2*(length(bin(n))-1)+1`` used by the oracle-checked size stats."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if (v < 1).any():
        raise ValueError("Gamma encoding requires positive integers")
    bl = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while tmp.any():
        bl += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(1)
    return 2 * bl - 1


def delta_bit_lengths(vals: np.ndarray) -> np.ndarray:
    """Bits delta(n) occupies: gamma_bits(bit_length(n)) + bit_length(n)-1."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    bl = (gamma_bit_lengths(v) + 1) // 2  # bit_length(n)
    return gamma_bit_lengths(bl.astype(np.uint64)) + bl - 1


def _pack_bits(vals: np.ndarray, widths: np.ndarray) -> tuple[np.ndarray, int]:
    """MSB-first bit-pack each vals[i] into a widths[i]-bit field,
    concatenated; → (uint8 stream, total_bits). Vectorized over the TOTAL
    bit count (one searchsorted + one scatter-or), no per-value loop."""
    total = int(widths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8), 0
    ends = np.cumsum(widths)
    starts = ends - widths
    idx = np.arange(total, dtype=np.int64)
    seg = np.searchsorted(ends, idx, side="right")
    shift = (widths[seg] - 1 - (idx - starts[seg])).astype(np.uint64)
    bits = ((vals[seg] >> shift) & np.uint64(1)).astype(np.uint8)
    out = np.zeros((total + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(out, idx >> 3, bits << (7 - (idx & 7)).astype(np.uint8))
    return out, total


def _unpack_bits(stream: np.ndarray, total_bits: int) -> np.ndarray:
    b = np.unpackbits(np.ascontiguousarray(stream, dtype=np.uint8))
    return b[:total_bits]


def gamma_encode(vals: np.ndarray) -> tuple[bytes, int]:
    """uint64 (all ≥ 1) → (MSB-first Elias-gamma stream, total_bits).
    Bit-exact with the reference's string codes ('00101' for 5, …)."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    return (lambda s: (s[0].tobytes(), s[1]))(_pack_bits(v, gamma_bit_lengths(v)))


def gamma_decode(data: bytes, total_bits: int) -> np.ndarray:
    """Inverse of gamma_encode. Per-code loop (decode is the parity/test
    path; varint remains the production block codec)."""
    bits = _unpack_bits(np.frombuffer(data, dtype=np.uint8), total_bits)
    out, pos, n = [], 0, bits.size
    while pos < n:
        zeros = 0
        while bits[pos] == 0:
            zeros += 1
            pos += 1
        width = zeros + 1
        val = 0
        for _ in range(width):
            val = (val << 1) | int(bits[pos])
            pos += 1
        out.append(val)
    return np.asarray(out, dtype=np.uint64)


def delta_encode(vals: np.ndarray) -> tuple[bytes, int]:
    """uint64 (all ≥ 1) → (MSB-first Elias-delta stream, total_bits).
    Field value = gamma-prefix ∘ offset as ONE integer: the gamma code of
    b=bit_length(n) reads as b, the trailing b-1 bits are n - 2^(b-1), so
    the field is (b << (b-1)) | offset at width γbits(b) + b - 1."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    bl = ((gamma_bit_lengths(v) + 1) // 2).astype(np.uint64)  # bit_length
    # the packed field is one uint64: its width is γbits(bl) + bl - 1,
    # which exceeds 64 for bit_length ≥ 55 ((bl << (bl-1)) wraps on
    # uint64 and the stream decodes garbage) — reject instead of wrap.
    # Doc-id gaps never approach 2^54; this is a safety net, not a limit
    # a posting stream can hit.
    if v.size and int(bl.max()) > 54:
        raise ValueError(
            "delta_encode: value with bit_length "
            f"{int(bl.max())} > 54 — its Elias-delta code exceeds the "
            "64-bit packing field"
        )
    offset = v - (np.uint64(1) << (bl - np.uint64(1)))
    field = (bl << (bl - np.uint64(1))) | offset
    widths = gamma_bit_lengths(bl) + bl.astype(np.int64) - 1
    s, total = _pack_bits(field, widths)
    return s.tobytes(), total


def delta_decode(data: bytes, total_bits: int) -> np.ndarray:
    bits = _unpack_bits(np.frombuffer(data, dtype=np.uint8), total_bits)
    out, pos = [], 0
    while pos < bits.size:
        zeros = 0
        while bits[pos] == 0:
            zeros += 1
            pos += 1
        bl = 0
        for _ in range(zeros + 1):  # gamma-coded bit_length(n)
            bl = (bl << 1) | int(bits[pos])
            pos += 1
        val = 1
        for _ in range(bl - 1):
            val = (val << 1) | int(bits[pos])
            pos += 1
        out.append(val)
    return np.asarray(out, dtype=np.uint64)


def _gaps(doc_ids: np.ndarray) -> np.ndarray:
    """Reference encode_gaps (compression.py:410-434): first gap is the
    first doc_id itself — which its gamma path REJECTS for doc_id 0. We
    totalize with first gap = doc_id[0] + 1 (offset from −1) so dense
    0-based ids encode; documented deviation, applied identically in the
    DuckDB oracle."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    g = np.empty(d.shape, dtype=np.uint64)
    if d.size:
        g[0] = np.uint64(int(d[0]) + 1)
        np.subtract(d[1:], d[:-1], out=g[1:].view(np.int64))
    return g


def compare_compression(doc_ids: np.ndarray) -> dict:
    """Reference compare_compression (compression.py:642-699): gap-encode
    one sorted posting list under VByte / Gamma / Delta, report sizes vs
    the 4-bytes-per-int baseline. Bit counts → bytes via ceil, per list."""
    g = _gaps(np.asarray(doc_ids))
    raw = 4 * len(g)
    vb = int(varint_byte_lengths(g).sum())
    gb = (int(gamma_bit_lengths(g).sum()) + 7) // 8
    db = (int(delta_bit_lengths(g).sum()) + 7) // 8
    return {
        "original_size": raw,
        "vbyte": {"compressed_size": vb, "compression_ratio": vb / raw if raw else 1.0},
        "gamma": {"compressed_size": gb, "compression_ratio": gb / raw if raw else 1.0},
        "delta": {"compressed_size": db, "compression_ratio": db / raw if raw else 1.0},
    }
