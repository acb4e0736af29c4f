"""Incremental cross-snapshot dedup (ops/incr_dedup.py): new batch vs
stored corpus state, reference DuplicateDetector semantics
(deduplication.py:204-298)."""

from __future__ import annotations

import pytest

from news_information_retrieval_system_spark.ops.dedup import md5_hash64_col
from news_information_retrieval_system_spark.ops.incr_dedup import (
    corpus_hash_state,
    corpus_simhash_state,
    incremental_exact_dedup,
    incremental_simhash_dedup,
)

CORPUS = [
    (0, "spark builds a fast index"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "bm25 ranks documents by term frequency and length"),
]
BATCH = [
    (100, "spark builds a fast index"),        # exact dup of corpus 0
    (101, "a genuinely new document about scans"),
    (102, "repeated payload inside the batch"),
    (103, "repeated payload inside the batch"),  # in-batch dup of 102
    (104, "another fresh one"),
    (105, "a genuinely new document about scans"),  # in-batch dup of 101
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture()
def batch(spark):
    return spark.createDataFrame(BATCH, "doc_id long, text string")


def test_exact_flags(corpus, batch):
    state = corpus_hash_state(corpus)
    out = {
        r.doc_id: (r.dup_of_corpus, r.dup_in_batch, r.kept)
        for r in incremental_exact_dedup(batch, state).collect()
    }
    assert out == {
        100: (1, 0, 0),
        101: (0, 0, 1),
        102: (0, 0, 1),
        103: (0, 1, 0),
        104: (0, 0, 1),
        105: (0, 1, 0),
    }


def test_exact_appending_survivors_makes_rerun_all_dup(corpus, batch):
    # the pipeline invariant: after appending kept hashes to the state,
    # re-running the SAME batch flags every row as a corpus duplicate
    state = corpus_hash_state(corpus)
    first = incremental_exact_dedup(batch, state)
    new_state = state.union(
        first.filter("kept = 1").select("content_hash")
    ).distinct()
    second = incremental_exact_dedup(batch, new_state)
    assert second.filter("dup_of_corpus = 0").count() == 0
    assert second.filter("kept = 1").count() == 0


def test_fuzzy_exact_copy_hits_at_zero(spark, corpus):
    fps = corpus_simhash_state(corpus, hash_fn=md5_hash64_col)
    batch = spark.createDataFrame(
        [(200, "the quick brown fox jumps over the lazy dog"),
         (201, "completely unrelated content regarding parquet files")],
        "doc_id long, text string",
    )
    hits = incremental_simhash_dedup(
        batch, fps, hamming=15, bands=16, hash_fn=md5_hash64_col
    ).collect()
    got = {(r.batch_id, r.corpus_id): r.hamming_dist for r in hits}
    assert got.get((200, 1)) == 0          # exact copy → Hamming 0
    assert all(b != 201 for b, _ in got)   # unrelated doc is fuzzy-fresh


def test_fuzzy_near_copy_within_threshold(spark, corpus):
    # one-token substitution in a 9-token doc stays within Hamming 15
    fps = corpus_simhash_state(corpus, hash_fn=md5_hash64_col)
    batch = spark.createDataFrame(
        [(300, "the quick brown fox leaps over the lazy dog")],
        "doc_id long, text string",
    )
    hits = incremental_simhash_dedup(
        batch, fps, hamming=15, bands=16, hash_fn=md5_hash64_col
    ).collect()
    assert any(
        r.corpus_id == 1 and 0 < r.hamming_dist <= 15 for r in hits
    )


def test_pigeonhole_guard(spark, corpus, batch):
    fps = corpus_simhash_state(corpus)
    with pytest.raises(ValueError, match="pigeonhole|bands"):
        incremental_simhash_dedup(batch, fps, hamming=5, bands=4)


def test_simhash_bands_must_divide_64(spark):
    import pytest

    from news_information_retrieval_system_spark.ops.dedup import (
        md5_hash64_col,
    )
    from news_information_retrieval_system_spark.ops.incr_dedup import (
        corpus_simhash_state,
        incremental_simhash_dedup,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    fps = corpus_simhash_state(docs, hash_fn=md5_hash64_col)
    # 64 % 5 != 0 would silently drop the top 4 fingerprint bits from all
    # band keys; must raise (a ValueError, not an -O-strippable assert)
    with pytest.raises(ValueError, match="must divide 64"):
        incremental_simhash_dedup(
            docs, fps, hamming=4, bands=5, hash_fn=md5_hash64_col
        )
