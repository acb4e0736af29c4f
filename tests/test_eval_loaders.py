"""Eval-data loaders vs hand-built fixture files in the reference formats."""

import json

from news_information_retrieval_system_spark.eval.loaders import (
    read_demo_qrels,
    read_qrels,
    read_queries,
)

QRELS_TXT = (
    "Q001 0 202511120135 0\n"
    "Q001\t0\t202511120256\t2\n"  # tab-separated variant
    "Q002  0   202511120267  1\n"  # runs of spaces
    "\n"  # blank line dropped
)

QUERIES_TSV = "Q001\tstorm damage\nQ002\tflood rescue\n"

DEMO = {
    "version": 1,
    "query_sets": {
        "demo": {
            "name": "Demo",
            "queries": [
                {"id": "N001", "query": "ai news", "description": "d1"},
                {"id": "N002", "query": "chips"},
            ],
            "qrels": {
                "N001": [
                    {"article_id": "a_1", "relevance": 3},
                    {"doc_id": "b_2", "grade": 2},
                    {"note": "no identifier — skipped"},
                    {"article_id": "c_3"},
                    # explicit JSON nulls behave exactly like absent keys
                    {"article_id": None, "doc_id": "d_4", "relevance": None},
                ]
            },
        }
    },
}


def test_read_qrels(spark, tmp_path):
    p = tmp_path / "qrels.txt"
    p.write_text(QRELS_TXT)
    rows = {
        (r["query_id"], r["doc_id"]): r["rel"]
        for r in read_qrels(spark, str(p)).collect()
    }
    assert rows == {
        ("Q001", "202511120135"): 0.0,
        ("Q001", "202511120256"): 2.0,
        ("Q002", "202511120267"): 1.0,
    }


def test_read_queries(spark, tmp_path):
    p = tmp_path / "queries.tsv"
    p.write_text(QUERIES_TSV)
    rows = dict(
        (r["query_id"], r["query"]) for r in read_queries(spark, str(p)).collect()
    )
    assert rows == {"Q001": "storm damage", "Q002": "flood rescue"}


def test_read_demo_qrels(spark, tmp_path):
    p = tmp_path / "demo_qrels.json"
    p.write_text(json.dumps(DEMO))
    queries, qrels = read_demo_qrels(spark, str(p), query_set="demo")
    q = {r["query_id"]: r for r in queries.collect()}
    assert q["N001"]["query"] == "ai news" and q["N001"]["description"] == "d1"
    assert q["N002"]["description"] == ""  # missing field defaults empty
    j = {(r["query_id"], r["doc_key"]): r["rel"] for r in qrels.collect()}
    # article_id preferred, doc_id fallback, no-identifier skipped,
    # grade fallback relevance -> grade -> 1.0
    assert j == {
        ("N001", "a_1"): 3.0,
        ("N001", "b_2"): 2.0,
        ("N001", "c_3"): 1.0,
        ("N001", "d_4"): 1.0,
    }
