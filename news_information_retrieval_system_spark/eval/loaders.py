"""Evaluation-data loaders: TREC qrels, TSV query files, curated demo qrels.

Reference: data/evaluation/qrels.txt (TREC 4-column ``qid 0 docid rel``),
data/evaluation/test_queries.txt (``Qxxx\\tquery`` TSV), and
data/evaluation/demo_qrels.json parsed by
src/ir_app/services/evaluation_service.py:262-392 (``query_sets → {set:
{queries: [{id, query, description}], qrels: {qid: [{article_id|doc_id,
relevance|grade}]}}}``; judgments default to grade 1 when neither field
is present, and rows with no document identifier are skipped).

Scale shape: qrels/query files are line-oriented text — ``spark.read.csv``
splits them across executors, so a billion-judgment qrel set loads as a
normal distributed scan. The curated demo-qrels JSON is a single small
nested config document (the reference ships ~tens of queries); it is
parsed driver-side and broadcast as a dim table, the same treatment the
engine gives any O(KB) config — NOT a pattern for data-scale JSON, which
goes through ``spark.read.json``.

The outputs feed ``eval/metrics.py`` directly: run_metrics(ranked,
qrels_df) with qrels_df = read_qrels(...).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("query", T.StringType()),
    ]
)


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """TREC qrels file → (query_id, doc_id, rel).

    Standard 4-column whitespace format ``qid iter docid rel``; the
    iteration column is discarded as in every TREC tool. Real qrels
    files mix tabs, single and multiple spaces, so lines are split on
    runs of whitespace (a fixed single-space csv separator silently
    shifts columns on tab-separated files). Blank lines are dropped;
    rel parses as double (graded judgments allowed).
    """
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(
            parts.getItem(0).alias("query_id"),
            parts.getItem(2).alias("doc_id"),
            parts.getItem(3).cast("double").alias("rel"),
        )
    )


def read_queries(spark: SparkSession, path: str) -> DataFrame:
    """TSV query file (``Qxxx\\tquery text``) → (query_id, query)."""
    raw = spark.read.csv(path, sep="\t", schema=_QUERIES_SCHEMA)
    return raw.filter(
        F.col("query_id").isNotNull() & F.col("query").isNotNull()
    )


def read_demo_qrels(
    spark: SparkSession, path: str, query_set: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Curated demo-qrels JSON → (queries_df, qrels_df).

    queries_df: (query_set, query_id, query, description)
    qrels_df:   (query_set, query_id, doc_key, rel) — doc_key is the
    judgment's article_id (falling back to doc_id), kept as a string for
    the caller to resolve against its corpus ids, exactly as the
    reference resolves judgments through its document service
    (evaluation_service.py:361-392). Judgments with neither identifier
    are skipped; grade falls back relevance → grade → 1.0.
    """
    with open(path, encoding="utf-8") as fh:
        payload = json.load(fh)
    sets = payload.get("query_sets", {})
    if query_set is not None:
        sets = {query_set: sets[query_set]}
    qrows, jrows = [], []
    for set_id, spec in sets.items():
        for q in spec.get("queries", []):
            qrows.append(
                (set_id, str(q["id"]), q.get("query", ""), q.get("description", ""))
            )
        for qid, judgments in (spec.get("qrels") or {}).items():
            for j in judgments:
                # explicit JSON nulls must fall through exactly like
                # absent keys (hand-curated files write both)
                key = j.get("article_id")
                if key is None:
                    key = j.get("doc_id")
                if key is None:
                    continue
                rel = j.get("relevance")
                if rel is None:
                    rel = j.get("grade")
                rel = 1.0 if rel is None else float(rel)
                jrows.append((set_id, str(qid), str(key), rel))
    queries_df = spark.createDataFrame(
        qrows, "query_set string, query_id string, query string, description string"
    )
    qrels_df = spark.createDataFrame(
        jrows, "query_set string, query_id string, doc_key string, rel double"
    )
    return queries_df, qrels_df
