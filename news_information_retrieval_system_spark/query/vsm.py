"""TF-IDF / vector-space-model cosine ranking.

Reference semantics: doc weight ``(1 + log10 tf) * idf`` L2-normalized per
doc; query weight ``qtf * idf`` (the app's live tfidf path —
src/ir_app/services/index_service.py:297-306 builds the vectors,
src/ir_app/services/search_service.py:366-382 weights the query); score is
the sparse dot product (src/ir/retrieval/vsm.py:114-298).

Physical plan: doc weights and norms are BUILD-time artifacts (one groupBy
over postings); query time is broadcast-join → sum — same one-shuffle shape
as BM25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .bm25 import topk


def build_tfidf_weights(index: FulltextIndex) -> DataFrame:
    """(term, doc_id, w_norm): L2-normalized ltc doc weights."""
    w = (
        index.postings.join(index.term_stats.select("term", "idf"), "term")
        .withColumn("w", (F.lit(1.0) + F.log10("tf")) * F.col("idf"))
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return (
        w.join(norms, "doc_id")
        .withColumn("w_norm", F.col("w") / F.col("norm"))
        .select("term", "doc_id", "w_norm")
    )


def score_tfidf(index: FulltextIndex, qterms: DataFrame, weights: DataFrame | None = None) -> DataFrame:
    """qterms(query_id, term[, qtf]) → (query_id, doc_id, score)."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    if weights is None:
        weights = build_tfidf_weights(index)
    qvec = index.term_stats.select("term", "idf").join(F.broadcast(qterms), "term")
    return (
        weights.join(F.broadcast(qvec), "term")
        .withColumn("contrib", F.col("qtf") * F.col("idf") * F.col("w_norm"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
        .filter(F.col("score") > 0)
    )


def tfidf_topk(index: FulltextIndex, qterms: DataFrame, k: int = 10, weights: DataFrame | None = None) -> DataFrame:
    return topk(score_tfidf(index, qterms, weights), k=k)


def doc_keywords(index: FulltextIndex, k: int = 5, rank_dp: int | None = None) -> DataFrame:
    """(doc_id, term, w, kw_rank): top-k TF-IDF keywords per document —
    the reference's PAT-tree keyword extraction with tfidf scoring
    (src/ir/index/pat_tree.py keyword scoring over term_weighting.py ltc
    weights), re-expressed as one join + one window over the postings
    table. ``rank_dp`` rounds weights before ranking so independent
    engines agree on near-ties."""
    from pyspark.sql import Window

    w = (
        index.postings.join(index.term_stats.select("term", "idf"), "term")
        .withColumn("w", (F.lit(1.0) + F.log10("tf")) * F.col("idf"))
    )
    order = F.round("w", rank_dp) if rank_dp is not None else F.col("w")
    win = Window.partitionBy("doc_id").orderBy(F.desc(order), F.asc("term"))
    return (
        w.withColumn("kw_rank", F.row_number().over(win))
        .filter(F.col("kw_rank") <= k)
        .select("doc_id", "term", "w", "kw_rank")
    )
