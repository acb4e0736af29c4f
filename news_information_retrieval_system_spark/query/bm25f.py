"""BM25F: weighted multi-field BM25 ranking (Robertson/Zaragoza 2004).

The reference weights fields post-hoc — an additive boost over the model
score with title .45 / tags .25 / category .18 / content .06
(src/ir_app/services/search_service.py:434-481, applied by
query/fieldboost.py). BM25F is the principled version of the same idea:
instead of boosting AFTER saturation, each field's term frequency is
length-normalized per field, weighted, and SUMMED BEFORE the k1
saturation —

    tf~(t,d) = Σ_f  w_f · tf(t,f,d) / (1 - b_f + b_f · dl_f(d)/avgdl_f)
    score(q,d) = Σ_t qtf · idf(t) · tf~ · (k1+1) / (k1 + tf~)

so a term hitting a high-weight short field (title) saturates like a
high-tf body hit rather than adding a capped bonus. idf uses the same
document-level formula as query/bm25.py (df = docs containing the term in
ANY field), and the (k1+1) numerator keeps scores on the same scale as
the engine's BM25.

Spark shape: ONE corpus scan — every field's token array is packed into
an array<struct<field,toks>> and exploded, so per-field tf, per-field
doc length, and document-level df all derive from a single pass (no
per-field scans). Per-field avgdl is an |F|-row aggregate broadcast back;
query terms and idf are broadcast into the postings-shaped frame exactly
like score_bm25 — the only wide exchange is the final per-(query, doc)
sum, identical to single-field BM25's cost.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .bm25 import topk

DEFAULT_BM25F_WEIGHTS = {"title": 0.45, "content": 0.06}


def _field_tokens(docs: DataFrame, fields: list[str], id_col: str) -> DataFrame:
    """(doc_id, field, ftoks): one exploded row per (doc, field), single scan."""
    packed = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"), tokens_col(F.col(f)).alias("ftoks")
            )
            for f in fields
        ]
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(packed).alias("p")
    ).select("doc_id", F.col("p.field").alias("field"), F.col("p.ftoks").alias("ftoks"))


def score_bm25f(
    docs: DataFrame,
    qterms: DataFrame,
    field_weights: Mapping[str, float] | None = None,
    k1: float = 1.2,
    b: float | Mapping[str, float] = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """docs(doc_id, <field columns>) + qterms(query_id, term[, qtf]) →
    (query_id, doc_id, score), unranked. ``field_weights`` maps field
    COLUMN names to weights; ``b`` may be per-field."""
    weights = dict(field_weights or DEFAULT_BM25F_WEIGHTS)
    fields = list(weights)
    b_of = {f: (b[f] if isinstance(b, Mapping) else b) for f in fields}
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))

    ft = _field_tokens(docs, fields, id_col)
    fdl = ft.select("doc_id", "field", F.size("ftoks").alias("dl"))
    ftf = (
        ft.select("doc_id", "field", F.explode("ftoks").alias("term"))
        .groupBy("doc_id", "field", "term")
        .agg(F.count("*").alias("tf"))
    )
    avgdl = fdl.groupBy("field").agg(F.avg("dl").alias("avgdl"))  # |F| rows

    n_docs = docs.count()
    df = (
        ftf.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = df.select(
        "term",
        F.log(
            1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )

    w_expr = F.create_map(
        *[x for f in fields for x in (F.lit(f), F.lit(float(weights[f])))]
    )
    b_expr = F.create_map(
        *[x for f in fields for x in (F.lit(f), F.lit(float(b_of[f])))]
    )
    wtf = (
        ftf.join(fdl, ["doc_id", "field"])
        .join(F.broadcast(avgdl), "field")
        .withColumn(
            "contrib",
            w_expr[F.col("field")]
            * F.col("tf")
            / (
                1.0
                - b_expr[F.col("field")]
                + b_expr[F.col("field")] * F.col("dl") / F.col("avgdl")
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.sum("contrib").alias("wtf"))
    )
    qidf = idf.join(F.broadcast(qterms), "term")  # tiny ⋈ dictionary, map-side
    hits = wtf.join(F.broadcast(qidf), "term")
    return (
        hits.withColumn(
            "score",
            F.col("qtf")
            * F.col("idf")
            * (F.col("wtf") * (k1 + 1.0))
            / (k1 + F.col("wtf")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )


def bm25f_topk(
    docs: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    field_weights: Mapping[str, float] | None = None,
    k1: float = 1.2,
    b: float | Mapping[str, float] = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-query top-k BM25F (score desc, doc_id asc)."""
    return topk(
        score_bm25f(docs, qterms, field_weights, k1=k1, b=b, id_col=id_col), k=k
    )
