"""Property-based codec hardening (hypothesis, no Spark session needed).

The block codec is the most bit-sensitive code in the engine — a single
wrong continuation bit silently corrupts postings at scale. These
properties pin roundtrip identity and size-accounting invariants over
adversarial inputs, complementing tests/test_codec.py's reference
goldens (reference semantics: src/ir/index/compression.py:73-699).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from news_information_retrieval_system_spark.index.codec import (
    compare_compression,
    decode_block,
    delta_bit_lengths,
    delta_decode,
    delta_encode,
    encode_block,
    gamma_bit_lengths,
    gamma_decode,
    gamma_encode,
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)

# Full uint64 range for varint; gamma/delta fields are packed into
# 64-bit lanes, so like the reference (which gamma-codes gaps, never
# raw 2^63-scale values) they carry values whose CODE fits 64 bits:
# gamma needs 2*floor(log2 n)+1 <= 64 → n < 2^32.
u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
pos32 = st.integers(min_value=1, max_value=(1 << 32) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=300))
def test_varint_roundtrip_and_sizes(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = varint_encode(v)
    assert enc.dtype == np.uint8
    assert len(enc) == int(varint_byte_lengths(v).sum())
    dec = varint_decode(enc)
    np.testing.assert_array_equal(dec, v)


@settings(max_examples=200, deadline=None)
@given(st.lists(pos32, min_size=1, max_size=200))
def test_gamma_roundtrip_and_bits(vals):
    v = np.array(vals, dtype=np.uint64)
    data, total = gamma_encode(v)
    assert total == int(gamma_bit_lengths(v).sum())
    assert len(data) == (total + 7) // 8
    np.testing.assert_array_equal(gamma_decode(data, total), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(pos32, min_size=1, max_size=200))
def test_delta_roundtrip_and_bits(vals):
    v = np.array(vals, dtype=np.uint64)
    data, total = delta_encode(v)
    assert total == int(delta_bit_lengths(v).sum())
    assert len(data) == (total + 7) // 8
    np.testing.assert_array_equal(delta_decode(data, total), v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40)), min_size=1, max_size=200
    ),
    st.data(),
)
def test_block_roundtrip(doc_id_pool, data):
    doc_ids = np.unique(np.array(doc_id_pool, dtype=np.int64))
    n = doc_ids.size
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    dls = np.array(
        data.draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    base = int(data.draw(st.integers(0, int(doc_ids[0]))))
    blob = encode_block(doc_ids, tfs, dls, base)
    d2, t2, l2 = decode_block(blob, n, base)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 30), min_size=1, max_size=200))
def test_compare_compression_consistency(ids):
    doc_ids = np.unique(np.array(ids, dtype=np.int64))
    rep = compare_compression(doc_ids)
    assert rep["original_size"] == 4 * doc_ids.size
    for codec in ("vbyte", "gamma", "delta"):
        entry = rep[codec]
        assert entry["compressed_size"] >= 1
        assert entry["compression_ratio"] == (
            entry["compressed_size"] / rep["original_size"]
        )
    # dense gaps (all 1s after the first) must compress well under every
    # codec once the list is long enough to amortize the first gap
    dense = np.arange(1000, dtype=np.int64)
    dr = compare_compression(dense)
    assert dr["gamma"]["compressed_size"] < dr["original_size"] // 8


def test_ef_roundtrip_and_size_formula():
    import numpy as np

    from news_information_retrieval_system_spark.index.codec import (
        ef_decode, ef_encode, ef_params,
    )

    cases = [
        np.array([0], dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.arange(100, dtype=np.int64),          # dense: l = 0
        np.arange(100, dtype=np.int64) * 1000,   # sparse: l ≈ 10
        np.array([3, 17, 4000, 4001, 10**12], dtype=np.int64),
    ]
    for v in cases:
        data, l = ef_encode(v)
        n, l2, bits = ef_params(v)
        assert l == l2
        assert len(data) == (bits + 7) // 8  # encoder == closed form
        assert (ef_decode(data, n, l) == v).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
             max_size=300, unique=True)
)
@settings(max_examples=60, deadline=None)
def test_ef_roundtrip_property(vals):
    import numpy as np

    from news_information_retrieval_system_spark.index.codec import (
        ef_decode, ef_encode, ef_params,
    )

    v = np.array(sorted(vals), dtype=np.int64)
    data, l = ef_encode(v)
    n, _, bits = ef_params(v)
    assert len(data) == (bits + 7) // 8
    assert (ef_decode(data, n, l) == v).all()


def test_ef_rejects_unsorted():
    import numpy as np

    import pytest as _pytest

    from news_information_retrieval_system_spark.index.codec import ef_encode

    with _pytest.raises(ValueError):
        ef_encode(np.array([5, 3], dtype=np.int64))
    with _pytest.raises(ValueError):
        ef_encode(np.array([3, 3], dtype=np.int64))  # strictly increasing
