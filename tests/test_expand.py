from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.query.expand import (
    expand_qterms,
    fuzzy_terms,
    wildcard_terms,
)


def test_wildcard_terms(spark, mini_docs):
    idx = build_index(mini_docs)
    got = sorted(r["term"] for r in wildcard_terms(idx, "qu*").collect())
    assert got == ["queries", "quick"]
    got = sorted(r["term"] for r in wildcard_terms(idx, "s?an").collect())
    assert got == ["scan"]


def test_fuzzy_terms(spark, mini_docs):
    idx = build_index(mini_docs)
    got = {r["term"]: r["dist"] for r in fuzzy_terms(idx, "fasts", 1).collect()}
    assert got == {"fast": 1}
    got = {r["term"]: r["dist"] for r in fuzzy_terms(idx, "scan", 1).collect()}
    assert got == {"scan": 0}


def test_expand_qterms(spark, mini_docs):
    idx = build_index(mini_docs)
    q = spark.createDataFrame([("q1", "fasts", 1)], "query_id string, term string, qtf int")
    got = sorted(r["term"] for r in expand_qterms(idx, q, max_distance=1).collect())
    assert got == ["fast"]
