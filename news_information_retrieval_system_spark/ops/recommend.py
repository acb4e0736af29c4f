"""Content-based recommendation: related documents by TF-IDF cosine
(SURVEY §2 A10).

Reference: src/ir/recommendation/content_based.py:63-340 — the
ContentBasedRecommender builds per-document TF-IDF vectors
(``build_tfidf_vectors``, :131-145) and recommends the top-k most
cosine-similar documents to a seed document (``compute_similarity``
:167-233 over the dense doc×doc similarity row). The collaborative
recommenders live in ``ops/recommend_cf.py`` (user/item kNN + ALS over
the events interaction log); the reference's hybrid recommender is a
weighted blend of this module's scores with those.

Spark shape: the doc×doc cosine is a SPARSE dot product over the
inverted index — join the seed documents' normalized weights with the
full weight table on ``term`` and sum per (seed, other) pair. Each
posting of a candidate doc is touched once per seed term it matches;
the seed side is broadcast (|seeds|·terms-per-doc rows). Hot terms fan
the join out by df — ``df_ceiling`` drops terms above a document
-frequency cap from the PAIRING step only (their weight still counts in
the norms), the standard stop-term guard for pairwise similarity at
scale; ``None`` reproduces the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from ..query.vsm import build_tfidf_weights


def related_docs(
    index: FulltextIndex,
    seeds: DataFrame,
    topn: int = 5,
    df_ceiling: int | None = None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """→ (seed_id, doc_id, cosine, rec_rank): top-n most-similar other
    documents per seed document, by TF-IDF (ltc) cosine.

    ``seeds``: a DataFrame with a ``doc_id`` column naming the documents
    to recommend for. Weights are L2-normalized per doc, so the cosine is
    a plain dot product of ``w_norm`` values. Ties: cosine (9dp) desc,
    doc_id asc — deterministic across engines.
    """
    if weights is None:
        weights = build_tfidf_weights(index)
    if df_ceiling is not None:
        keep = index.term_stats.filter(F.col("df") <= df_ceiling).select("term")
        pair_w = weights.join(F.broadcast(keep), "term")
    else:
        pair_w = weights
    seed_w = pair_w.join(
        F.broadcast(seeds.select("doc_id").distinct()), "doc_id", "left_semi"
    ).select(
        F.col("doc_id").alias("seed_id"), "term", F.col("w_norm").alias("w_seed")
    )
    pairs = (
        pair_w.join(seed_w, "term")
        .filter(F.col("doc_id") != F.col("seed_id"))
        .groupBy("seed_id", "doc_id")
        .agg(F.round(F.sum(F.col("w_norm") * F.col("w_seed")), 9).alias("cosine"))
    )
    w = Window.partitionBy("seed_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        pairs.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= topn)
        .select("seed_id", "doc_id", "cosine", "rec_rank")
    )
