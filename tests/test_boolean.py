import pytest

from news_information_retrieval_system_spark.index.build import build_index, build_positional
from news_information_retrieval_system_spark.query.boolean import BooleanEngine, BooleanParser

from conftest import MINI_CORPUS


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _oracle_sets():
    from news_information_retrieval_system_spark.tokenize import py_tokenize

    sets = {}
    for d, text in MINI_CORPUS:
        for t in set(py_tokenize(text)):
            sets.setdefault(t, set()).add(d)
    return sets


@pytest.fixture(scope="module")
def engine(spark, mini_docs):
    idx = build_index(mini_docs)
    pos = build_positional(mini_docs)
    return BooleanEngine(idx, pos)


def test_and_or_not(engine):
    s = _oracle_sets()
    assert _ids(engine.query("fast AND index")) == sorted(s["fast"] & s["index"])
    assert _ids(engine.query("fox OR bm25")) == sorted(s["fox"] | s["bm25"])
    universe = set(range(len(MINI_CORPUS)))
    assert _ids(engine.query("NOT index")) == sorted(universe - s["index"])
    assert _ids(engine.query("NOT (fast OR fox)")) == sorted(
        universe - (s["fast"] | s["fox"])
    )


def test_precedence_and_implicit_and(engine):
    s = _oracle_sets()
    # NOT > AND > OR
    assert _ids(engine.query("fox OR fast AND scan")) == sorted(
        s["fox"] | (s["fast"] & s["scan"])
    )
    # bare adjacency = AND
    assert _ids(engine.query("fast index")) == sorted(s["fast"] & s["index"])


def test_phrase_and_near(engine):
    # "inverted index" occurs in docs 1 and 7
    assert _ids(engine.query('"inverted index"')) == [1, 7]
    # "fast index" adjacent in doc 0 ("a fast index") and doc 2 ("a fast
    # index and")
    assert _ids(engine.query('"fast index"')) == [0, 2]
    # NEAR/3: fast ... scan within 3 tokens: doc 2 "fast scan" at 8,9
    assert 2 in _ids(engine.query("fast NEAR/3 scan"))


def test_wildcard(engine):
    s = _oracle_sets()
    want = sorted(
        set().union(*(docs for t, docs in s.items() if t.startswith("qu")))
    )
    assert _ids(engine.query("qu*")) == want


def test_ranked_boolean(engine):
    rows = engine.query("fast AND index", rank=True).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    # doc 2: fast x3 + index x1 = 4; doc 0: fast 1 + index 1 = 2
    assert scores[2] == 4
    assert scores[0] == 2


def test_parser_errors():
    p = BooleanParser()
    with pytest.raises(ValueError):
        p.parse("(a OR b")
