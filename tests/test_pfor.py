"""PForDelta codec: round-trip, cost-model, and block-twin parity tests.

The codec is the north-rule "varint/PForDelta block compression"
extension; the reference itself ships VByte/Gamma/Delta only
(src/ir/index/compression.py:73-639), so parity here is against the
documented layout + the closed-form cost the DuckDB oracle mirrors.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from news_information_retrieval_system_spark.index.codec import (
    BLOCK_CODECS,
    decode_block,
    decode_block_pfor,
    encode_block,
    encode_block_pfor,
    pfor_choose_width,
    pfor_decode,
    pfor_decode_at,
    pfor_encode,
    pfor_stats,
)


def _roundtrip(vals):
    v = np.asarray(vals, dtype=np.uint64)
    out = pfor_decode(pfor_encode(v))
    np.testing.assert_array_equal(out, v)


def test_empty():
    _roundtrip([])
    assert pfor_decode(pfor_encode(np.empty(0, dtype=np.uint64))).size == 0


def test_zeros_only():
    # b=0 frame, no exceptions, no packed bytes
    v = np.zeros(100, dtype=np.uint64)
    blob = pfor_encode(v)
    assert pfor_choose_width(v)[0] == 0
    assert len(blob) == pfor_choose_width(v)[1]
    _roundtrip(v)


def test_uniform_small():
    _roundtrip(np.full(257, 5, dtype=np.uint64))


def test_single_huge_outlier():
    # classic PFor case: tiny values + one outlier → small b + 1 exception
    v = np.array([1, 2, 3, 2, 1, 2**40, 3, 1], dtype=np.uint64)
    b, _ = pfor_choose_width(v)
    assert b <= 2
    st_ = pfor_stats(np.cumsum(v.astype(np.int64)))
    assert st_["n"] == v.size
    _roundtrip(v)


def test_exception_at_position_zero():
    _roundtrip(np.array([2**30, 1, 1, 1], dtype=np.uint64))


def test_all_exceptions():
    # values so spread that even b* leaves exceptions — still round-trips
    _roundtrip((np.uint64(1) << np.arange(0, 60, dtype=np.uint64)))


def test_cost_model_matches_encoder():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 500))
        v = rng.integers(0, 1 << int(rng.integers(1, 44)), size=n).astype(np.uint64)
        b, cost = pfor_choose_width(v)
        assert len(pfor_encode(v)) == cost


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 54) - 1), max_size=300)
)
def test_roundtrip_property(vals):
    _roundtrip(vals)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 54) - 1), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=60),
)
def test_chained_streams(a, b):
    va = np.asarray(a, dtype=np.uint64)
    vb = np.asarray(b, dtype=np.uint64)
    blob = pfor_encode(va) + pfor_encode(vb)
    buf = np.frombuffer(blob, dtype=np.uint8)
    da, off = pfor_decode_at(buf, 0)
    db, off2 = pfor_decode_at(buf, off)
    assert off2 == len(blob)
    np.testing.assert_array_equal(da, va)
    np.testing.assert_array_equal(db, vb)


def test_block_twin_parity():
    """encode_block_pfor/decode_block_pfor agree with the varint block
    codec on the same (doc_ids, tfs, dls, base) contract."""
    rng = np.random.default_rng(11)
    base = 4 << 14
    d = np.sort(rng.choice(np.arange(base, base + 16384), size=700, replace=False))
    tf = rng.integers(1, 50, size=700)
    dl = rng.integers(5, 2000, size=700)
    via_varint = decode_block(encode_block(d, tf, dl, base), 700, base)
    via_pfor = decode_block_pfor(encode_block_pfor(d, tf, dl, base), 700, base)
    for a, b in zip(via_varint, via_pfor):
        np.testing.assert_array_equal(a, b)


def test_block_codec_registry():
    assert set(BLOCK_CODECS) == {"varint", "pfor", "ef"}
    enc, dec = BLOCK_CODECS["pfor"]
    d = np.array([10, 11, 400], dtype=np.int64)
    got = dec(enc(d, np.array([1, 2, 3]), np.array([9, 9, 9]), 0), 3, 0)
    np.testing.assert_array_equal(got[0], d)


def test_pfor_beats_varint_on_dense_gaps():
    """Dense postings (gap≈1) are PFor's home turf: ~1 bit/doc vs varint's
    1 byte/doc floor."""
    d = np.arange(0, 5000, dtype=np.int64)  # all gaps = 1
    s = pfor_stats(d)
    assert s["b"] <= 1
    assert s["compressed_size"] < 5000 // 7  # varint would be ≥ 5000 bytes


def test_corrupt_block_raises():
    blob = encode_block_pfor(np.array([1, 2, 3]), np.array([1, 1, 1]), np.array([4, 4, 4]), 0)
    with pytest.raises(AssertionError):
        decode_block_pfor(blob, 5, 0)


def test_ef_block_twin_parity():
    """encode_block_ef/decode_block_ef agree with the varint block codec
    on the same (doc_ids, tfs, dls, base) contract, and an end-to-end
    blocked build + WAND over ef blocks is rank-identical to varint."""
    from news_information_retrieval_system_spark.index.codec import (
        decode_block_ef, encode_block_ef,
    )

    rng = np.random.default_rng(13)
    base = 7 << 14
    d = np.sort(rng.choice(np.arange(base, base + 16384), size=900, replace=False))
    tf = rng.integers(1, 50, size=900)
    dl = rng.integers(5, 2000, size=900)
    via_varint = decode_block(encode_block(d, tf, dl, base), 900, base)
    via_ef = decode_block_ef(encode_block_ef(d, tf, dl, base), 900, base)
    for a, b in zip(via_varint, via_ef):
        np.testing.assert_array_equal(a, b)


def test_wand_over_ef_blocks_rank_identical(spark):
    from pyspark.sql import functions as F

    from news_information_retrieval_system_spark.index.build import build_index
    from news_information_retrieval_system_spark.index.segments import (
        build_blocked_postings,
    )
    from news_information_retrieval_system_spark.query.bm25 import query_terms_df
    from news_information_retrieval_system_spark.query.wand import wand_topk

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    idx = build_index(docs).materialize()
    q = query_terms_df(spark, {"q1": "fast table scan", "q2": "slow value"})
    qi = q.join(idx.term_stats.select("term", "idf"), "term")
    n_docs, avgdl = idx.scalar_stats()

    def run(codec):
        blk = build_blocked_postings(
            idx.postings, term_dict=idx.term_stats, codec=codec
        )
        out = wand_topk(blk, qi, n_docs, avgdl, k=10, codec=codec)
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in out.collect()
        )

    assert run("ef") == run("varint")
