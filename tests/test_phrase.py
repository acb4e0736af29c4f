from news_information_retrieval_system_spark.index.build import build_positional
from news_information_retrieval_system_spark.query.phrase import (
    phrase_match,
    proximity_match,
    window_match,
)


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_phrase_counts(spark, mini_docs):
    pos = build_positional(mini_docs)
    rows = {r["doc_id"]: r["match_count"] for r in phrase_match(pos, ["the", "index"]).collect()}
    # doc 1 "the index is...": 0-1; doc 5 "the fox likes the index": 3-4;
    # doc 6 "scan the table then scan the index": 5-6
    assert rows == {1: 1, 5: 1, 6: 1}


def test_three_term_phrase(spark, mini_docs):
    pos = build_positional(mini_docs)
    assert _ids(phrase_match(pos, ["an", "inverted", "index"])) == [1]
    assert _ids(phrase_match(pos, ["inverted", "index", "with"])) == [7]


def test_proximity(spark, mini_docs):
    pos = build_positional(mini_docs)
    # doc 2 "fast queries need a fast index and a fast scan":
    # fast@{0,4,8}, scan@9 → distance 1
    assert 2 in _ids(proximity_match(pos, "fast", "scan", 1))
    # doc 2 scan@9/index@5 → distance 4; doc 6 scan@{0,4}/index@6 → distance 2
    assert _ids(proximity_match(pos, "scan", "index", 1)) == []
    assert _ids(proximity_match(pos, "scan", "index", 2)) == [6]
    assert _ids(proximity_match(pos, "scan", "index", 4)) == [2, 6]


def test_window(spark, mini_docs):
    pos = build_positional(mini_docs)
    # doc 2: fast@0, queries@1, need@2 — all in window 3
    assert 2 in _ids(window_match(pos, ["fast", "queries", "need"], 3))
    # window 2 cannot hold 3 distinct positions
    assert 2 not in _ids(window_match(pos, ["fast", "queries", "need"], 2))
    # order-insensitive: doc 7 "spark queries the inverted index with bm25"
    assert 7 in _ids(window_match(pos, ["inverted", "spark"], 4))
    assert 7 not in _ids(window_match(pos, ["inverted", "spark"], 3))
