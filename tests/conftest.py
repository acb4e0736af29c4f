from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from news_information_retrieval_system_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nirs-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


MINI_CORPUS = [
    # (doc_id, text) — hand-checkable corpus, style of reference
    # tests/test_inverted_index.py (tiny English docs, exact postings).
    (0, "spark builds a fast index"),
    (1, "the index is an inverted index"),
    (2, "fast queries need a fast index and a fast scan"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "bm25 ranks documents by term frequency and length"),
    (5, "the fox likes the index"),
    (6, "scan the table then scan the index"),
    (7, "spark queries the inverted index with bm25"),
]


@pytest.fixture(scope="session")
def mini_docs(spark):
    df = spark.createDataFrame(MINI_CORPUS, "doc_id long, text string")
    df.persist().count()
    return df
