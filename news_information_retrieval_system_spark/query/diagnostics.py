"""Cross-model ranking diagnostics (Q28).

Reference: src/ir_app/services/ranking_diagnostics_service.py:24-172 —
for one query/document pair, per-term contribution rows for each model
(BM25 explain, TF-IDF query·doc weights, LM log-probs), merged into one
explainable structure. The reference loops models and re-scores per
(query, doc) pair; here ALL models' per-term contributions are columns of
ONE row, produced by a single candidate×query-term expansion — one
postings join, shared by every model, instead of a scan per model.

Physical plan: ``pairs`` (the query/doc pairs under diagnosis — typically
each query's top-k) is broadcast-semi-joined into the postings scan, so
the matrix touches only the diagnosed documents' postings regardless of
corpus size; TF-IDF norms are computed over exactly those docs' postings
(a norm needs every term of its doc, not of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .lm import collection_stats


def model_term_matrix(
    index: FulltextIndex,
    qterms: DataFrame,
    pairs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    mu: float = 2000.0,
) -> DataFrame:
    """Per-(query, doc, term) cross-model contribution matrix.

    ``qterms``: (query_id, term[, qtf]); ``pairs``: (query_id, doc_id) —
    the pairs to diagnose. → (query_id, doc_id, term, qtf, tf, df, idf,
    bm25_term, tfidf_term, lm_term, bim_term, matched). Terms absent from
    the doc get tf=0 rows (the reference's "term not in document" reason,
    ranking_diagnostics_service.py:130): bm25/tfidf/bim contribute 0,
    LM contributes the smoothed-background log-prob — exactly each
    model's semantics for a missing term.

    * bm25_term — reference bm25.py:326-404 explain_score
    * tfidf_term — qtf·idf · L2-normalized (1+log10 tf)·idf doc weight
      (ranking_diagnostics_service.py:103-136)
    * lm_term — Dirichlet qtf·ln((tf + μ·p_c)/(dl + μ))
      (language_model_retrieval.py:190-268 explain path)
    * bim_term — RSJ ln((N-df+0.5)/(df+0.5)) when the term is present,
      once per distinct term (bim.py:141-260 ignores qtf)
    """
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    # doc lengths of the diagnosed docs only
    doc_ids = pairs.select("doc_id").distinct()
    doc_post = index.postings.join(F.broadcast(doc_ids), "doc_id", "left_semi")
    dls = doc_post.select("doc_id", "dl").distinct()
    # TF-IDF weights + norms over the diagnosed docs' postings only
    w = doc_post.join(index.term_stats.select("term", "idf"), "term").withColumn(
        "w", (F.lit(1.0) + F.log10("tf")) * F.col("idf")
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    w_norm = (
        w.join(norms, "doc_id")
        .withColumn("w_norm", F.col("w") / F.col("norm"))
        .select("term", "doc_id", "w_norm")
    )
    # one row per (pair × query term); stats/idf/p_c broadcast in
    qstats = (
        index.term_stats.select("term", "df", "idf")
        .join(F.broadcast(qterms), "term")
        .join(collection_stats(index).select("term", "p_c"), "term")
        .join(F.broadcast(index.stats), how="cross")
    )
    base = (
        pairs.join(F.broadcast(qstats), "query_id")
        .join(dls, "doc_id")
        .join(doc_post.select("term", "doc_id", "tf"), ["term", "doc_id"], "left")
        .join(w_norm, ["term", "doc_id"], "left")
        .fillna({"tf": 0, "w_norm": 0.0})
    )
    norm_tf = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    lm_p = (F.col("tf") + mu * F.col("p_c")) / (F.col("dl") + F.lit(mu))
    bim_w = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return base.select(
        "query_id",
        "doc_id",
        "term",
        "qtf",
        "tf",
        "df",
        "idf",
        (F.col("qtf") * F.col("idf") * norm_tf).alias("bm25_term"),
        (F.col("qtf") * F.col("idf") * F.col("w_norm")).alias("tfidf_term"),
        (F.col("qtf") * F.log(lm_p)).alias("lm_term"),
        F.when(F.col("tf") > 0, bim_w).otherwise(F.lit(0.0)).alias("bim_term"),
        (F.col("tf") > 0).alias("matched"),
    )
