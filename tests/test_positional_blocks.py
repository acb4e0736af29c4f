"""Positional block codec + blocked phrase kernel vs the flat path."""

from __future__ import annotations

import numpy as np
import pytest

from news_information_retrieval_system_spark.index.build import build_positional
from news_information_retrieval_system_spark.index.positional_blocks import (
    build_positional_blocks,
    decode_pos_block,
    encode_pos_block,
    phrase_match_blocks,
)
from news_information_retrieval_system_spark.query.phrase import phrase_match


def test_pos_block_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        base = int(rng.integers(0, 1 << 40)) & ~((1 << 14) - 1)
        doc_ids = base + np.sort(
            rng.choice(1 << 14, size=n, replace=False)
        ).astype(np.int64)
        freqs = rng.integers(1, 6, size=n).astype(np.int64)
        pos = np.concatenate(
            [
                np.sort(rng.choice(500, size=f, replace=False))
                for f in freqs
            ]
        ).astype(np.int64)
        blob = encode_pos_block(doc_ids, freqs, pos, base)
        d2, f2, p2 = decode_pos_block(blob, n, base)
        assert np.array_equal(d2, doc_ids)
        assert np.array_equal(f2, freqs)
        assert np.array_equal(p2, pos)


def test_pos_block_roundtrip_position_zero_and_single():
    # doc whose first occurrence is position 0, single-doc block
    blob = encode_pos_block(
        np.array([100], dtype=np.int64),
        np.array([3], dtype=np.int64),
        np.array([0, 4, 9], dtype=np.int64),
        96,
    )
    d, f, p = decode_pos_block(blob, 1, 96)
    assert d.tolist() == [100] and f.tolist() == [3] and p.tolist() == [0, 4, 9]


def _flat_vs_blocked(spark, docs, terms, span_bits):
    flat = {
        (r["doc_id"], r["match_count"])
        for r in phrase_match(build_positional(docs), terms).collect()
    }
    blocks = build_positional_blocks(docs, span_bits=span_bits)
    blocked = {
        (r["doc_id"], r["match_count"])
        for r in phrase_match_blocks(blocks, terms).collect()
    }
    assert blocked == flat
    return flat


def test_blocked_phrase_matches_flat(spark, mini_docs):
    hits = _flat_vs_blocked(spark, mini_docs, ["the", "index"], span_bits=14)
    assert hits  # "the index" occurs in the mini corpus


def test_blocked_phrase_three_terms_tiny_blocks(spark, mini_docs):
    # span_bits=1 forces docs into many blocks — straddling exercised
    _flat_vs_blocked(spark, mini_docs, ["the", "inverted", "index"], span_bits=1)


def test_blocked_phrase_repeated_term(spark):
    docs = spark.createDataFrame(
        [(0, "go go go stop"), (1, "go stop go go"), (2, "stop go stop")],
        "doc_id long, text string",
    )
    hits = _flat_vs_blocked(spark, docs, ["go", "go"], span_bits=1)
    assert hits == {(0, 2), (1, 1)}


def test_blocked_phrase_missing_term_empty(spark, mini_docs):
    blocks = build_positional_blocks(mini_docs)
    out = phrase_match_blocks(blocks, ["index", "zzzzz"]).collect()
    assert out == []


def test_blocked_phrase_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hits = _flat_vs_blocked(spark, docs, ["fast", "scan"], span_bits=8)
    assert hits  # driver PHRASE has matches at sf0.001


def test_blocked_proximity_matches_flat(spark, mini_docs):
    from news_information_retrieval_system_spark.query.phrase import proximity_match

    flat = {
        r["doc_id"]
        for r in proximity_match(build_positional(mini_docs), "fast", "index", 2).collect()
    }
    blocks = build_positional_blocks(mini_docs, span_bits=1)
    from news_information_retrieval_system_spark.index.positional_blocks import (
        proximity_match_blocks,
    )

    blocked = {r["doc_id"] for r in proximity_match_blocks(blocks, "fast", "index", 2).collect()}
    assert blocked == flat and flat


def test_blocked_proximity_position_zero_negative_probe(spark):
    from news_information_retrieval_system_spark.index.positional_blocks import (
        proximity_match_blocks,
    )

    # t1 at position 0: the -n probes underflow into the previous doc's
    # key space and must NOT false-positive against its positions
    docs = spark.createDataFrame(
        [(0, "x filler filler filler tail y"), (1, "y filler x")],
        "doc_id long, text string",
    )
    blocks = build_positional_blocks(docs, span_bits=1)
    out = {r["doc_id"] for r in proximity_match_blocks(blocks, "y", "x", 2).collect()}
    # doc 0: y at 5, x at 0 -> dist 5 > 2 (no); doc 1: y at 0, x at 2 -> yes
    assert out == {1}


def test_blocked_window_matches_flat(spark, mini_docs):
    from news_information_retrieval_system_spark.index.positional_blocks import (
        window_match_blocks,
    )
    from news_information_retrieval_system_spark.query.phrase import window_match

    for terms, w in [(["fast", "index"], 3), (["the", "fox", "index"], 4),
                     (["scan", "table"], 5)]:
        flat = {
            r["doc_id"]
            for r in window_match(build_positional(mini_docs), terms, w).collect()
        }
        blocks = build_positional_blocks(mini_docs, span_bits=1)
        blocked = {
            r["doc_id"] for r in window_match_blocks(blocks, terms, w).collect()
        }
        assert blocked == flat, (terms, w)


def test_blocked_window_span_boundary(spark):
    from news_information_retrieval_system_spark.index.positional_blocks import (
        window_match_blocks,
    )

    # "a ... b" distance exactly window-1 matches; distance window does not
    docs = spark.createDataFrame(
        [(0, "a x b"), (1, "a x y b")], "doc_id long, text string"
    )
    blocks = build_positional_blocks(docs, span_bits=1)
    out = {r["doc_id"] for r in window_match_blocks(blocks, ["a", "b"], 3).collect()}
    assert out == {0}


def test_merge_positional_incremental_equals_rebuild(spark, mini_docs):
    from news_information_retrieval_system_spark.index.positional_blocks import (
        merge_positional_blocks,
    )

    # interleaved halves so doc ranges straddle segments
    a = mini_docs.filter("doc_id % 2 = 0")
    b = mini_docs.filter("doc_id % 2 = 1")
    sb = 1
    merged = merge_positional_blocks(
        build_positional_blocks(a, span_bits=sb).unionByName(
            build_positional_blocks(b, span_bits=sb)
        ),
        span_bits=sb,
    )
    full = build_positional_blocks(mini_docs, span_bits=sb)

    for terms in (["the", "index"], ["fast", "index"]):
        got = {
            (r["doc_id"], r["match_count"])
            for r in phrase_match_blocks(merged, terms).collect()
        }
        want = {
            (r["doc_id"], r["match_count"])
            for r in phrase_match_blocks(full, terms).collect()
        }
        assert got == want and want

    # the merged block table is byte-identical to the rebuild
    key = lambda rows: {
        (r["term"], r["block_key"]): (r["n"], r["min_doc"], r["max_doc"],
                                      r["n_pos"], bytes(r["data"]))
        for r in rows
    }
    assert key(merged.collect()) == key(full.collect())
