from __future__ import annotations

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index import build_index
from news_information_retrieval_system_spark.query.bm25 import (
    query_terms_df,
    score_bm25,
)
from news_information_retrieval_system_spark.query.bm25f import (
    bm25f_topk,
    score_bm25f,
)


def test_single_field_bm25f_equals_bm25(spark, mini_docs):
    # With one field at weight 1.0 the BM25F algebra collapses to BM25:
    # wtf*(k1+1)/(k1+wtf) == tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).
    q = query_terms_df(spark, {"q1": "fast index", "q2": "fox bm25"})
    f = score_bm25f(mini_docs, q, field_weights={"text": 1.0}).collect()
    b = score_bm25(build_index(mini_docs), q).collect()
    fmap = {(r["query_id"], r["doc_id"]): r["score"] for r in f}
    bmap = {(r["query_id"], r["doc_id"]): r["score"] for r in b}
    assert set(fmap) == set(bmap)
    for key in fmap:
        assert abs(fmap[key] - bmap[key]) < 1e-9


def test_title_hit_outranks_content_hit(spark):
    # Same term, same per-field length: the doc matching in the
    # high-weight field must score strictly higher.
    docs = spark.createDataFrame(
        [
            (0, "needle alpha", "beta gamma delta epsilon"),
            (1, "alpha beta", "needle gamma delta epsilon"),
            (2, "zeta eta", "theta iota kappa lambda"),
        ],
        "doc_id long, title string, content string",
    )
    q = query_terms_df(spark, {"q1": "needle"})
    out = bm25f_topk(
        docs, q, k=3, field_weights={"title": 0.45, "content": 0.06}
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 0 and ranked[1] == 1


def test_empty_field_rows_do_not_poison_scores(spark):
    docs = spark.createDataFrame(
        [(0, "needle", ""), (1, "", "needle haystack")],
        "doc_id long, title string, content string",
    )
    q = query_terms_df(spark, {"q1": "needle"})
    out = score_bm25f(docs, q, field_weights={"title": 1.0, "content": 1.0})
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    assert set(rows) == {0, 1}
    assert all(s > 0 and s == s for s in rows.values())  # finite, non-NaN


def test_per_field_b_mapping(spark):
    # b=0 disables length normalization for that field: two docs with the
    # same tf but different field lengths then score identically.
    docs = spark.createDataFrame(
        [(0, "needle a"), (1, "needle a b c d e f g")],
        "doc_id long, title string",
    )
    q = query_terms_df(spark, {"q1": "needle"})
    out = score_bm25f(docs, q, field_weights={"title": 1.0}, b={"title": 0.0})
    scores = [r["score"] for r in out.orderBy("doc_id").collect()]
    assert abs(scores[0] - scores[1]) < 1e-12
