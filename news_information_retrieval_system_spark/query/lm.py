"""Query-likelihood language-model retrieval (Dirichlet / Jelinek-Mercer).

Reference: src/ir/retrieval/language_model_retrieval.py:190-413 — Dirichlet
``p(t|D) = (tf + μ·p(t|C)) / (dl + μ)`` (μ=2000 default, app wires μ via
index_service.py:383-387), JM ``λ·p(t|D) + (1-λ)·p(t|C)`` (λ=0.7); log-space
sum over query terms; candidates = union of postings. Query terms unseen in
the collection are dropped (they shift every candidate equally by -inf).

Plan: candidates × query-terms cross (broadcast, |cand|·|Q| rows) with a
left join back to postings for tf — the absent-term tf=0 case is what makes
LM different from the additive BM25/BIM shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from .bm25 import topk


def collection_stats(index: FulltextIndex) -> DataFrame:
    """(term, cf, p_c): collection term frequency and unigram probability.

    Reads the already-persisted ``term_agg(term, df, _ttf)`` that
    ``build_index`` derives once — zero postings passes per query batch.
    Falls back to a postings aggregation only for hand-built indexes that
    carry no term_agg."""
    if index.term_agg is not None:
        cf = index.term_agg.select("term", F.col("_ttf").alias("cf"))
        total = index.term_agg.agg(F.sum("_ttf").alias("total_tokens"))
    else:
        cf = index.postings.groupBy("term").agg(F.sum("tf").alias("cf"))
        # Σ_docs dl = Σ_postings tf — avoids the doc-level groupBy shuffle
        total = index.postings.agg(F.sum("tf").alias("total_tokens"))
    return cf.join(F.broadcast(total), how="cross").withColumn(
        "p_c", F.col("cf") / F.col("total_tokens")
    ).select("term", "cf", "p_c")


def score_lm(
    index: FulltextIndex,
    qterms: DataFrame,
    mu: float = 2000.0,
    lam: float | None = None,
    df_ceiling: float | None = None,
) -> DataFrame:
    """Dirichlet by default; pass ``lam`` for Jelinek-Mercer instead.
    ``df_ceiling`` bounds candidate generation for stopword-grade terms
    (see ``_lm_cross``)."""
    # every candidate scores EVERY term of ITS query (tf=0 when absent)
    scored = _lm_cross(index, qterms, df_ceiling)
    if lam is None:
        p = (F.col("tf") + mu * F.col("p_c")) / (F.col("dl") + F.lit(mu))
    else:
        p = lam * F.col("tf") / F.col("dl") + (1.0 - lam) * F.col("p_c")
    return (
        scored.withColumn("contrib", F.col("qtf") * F.log(p))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def lm_topk(index: FulltextIndex, qterms: DataFrame, k: int = 10, mu: float = 2000.0) -> DataFrame:
    return topk(score_lm(index, qterms, mu=mu), k=k)


def _lm_cross(
    index: FulltextIndex, qterms: DataFrame, df_ceiling: float | None = None
):
    """Shared candidate × query-term expansion with tf left-joined
    (tf=0 for absent terms): → frame with qtf, p_c, tf, dl columns.

    ``df_ceiling`` (fraction of n_docs, e.g. 0.5): stopword-grade query
    terms above the ceiling still SCORE on every candidate, but stop
    GENERATING candidates — without this the |cand|·|Q| expansion is
    Θ(N·|Q|) whenever one query term matches half the corpus. Results
    change only for docs whose sole match is a dropped hot term — docs
    the reference's own candidate pruning would rank at the tail. Default
    None preserves exact reference semantics."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    qcf = collection_stats(index).join(F.broadcast(qterms), "term")
    gen = qcf.select("query_id", "term").distinct()
    if df_ceiling is not None:
        dfs = index.term_stats.select("term", "df").join(
            F.broadcast(index.stats), how="cross"
        )
        keep = dfs.filter(
            F.col("df") <= F.lit(df_ceiling) * F.col("n_docs")
        ).select("term")
        gen = gen.join(F.broadcast(keep), "term", "left_semi")
    hits = index.postings.join(F.broadcast(gen), "term")
    cand = hits.select("query_id", "doc_id", "dl").distinct()
    cross = cand.join(F.broadcast(qcf), "query_id")
    tf = index.postings.select("term", "doc_id", "tf")
    return cross.join(tf, ["term", "doc_id"], "left").fillna({"tf": 0})


def score_lm_absdisc(
    index: FulltextIndex, qterms: DataFrame, delta: float = 0.7
) -> DataFrame:
    """Absolute discounting (language_model_retrieval.py:270-302):
    p(t|D) = max(tf-δ,0)/dl + α·p(t|C) with α = δ·|unique terms of D|/dl.
    The unique-term count is a postings group-by, not a doc-model dict."""
    uterms = index.postings.groupBy("doc_id").agg(
        F.count("*").cast("double").alias("u")
    )
    scored = _lm_cross(index, qterms).join(uterms, "doc_id")
    p = (
        F.greatest(F.col("tf") - F.lit(delta), F.lit(0.0)) / F.col("dl")
        + (F.lit(delta) * F.col("u") / F.col("dl")) * F.col("p_c")
    )
    return (
        scored.withColumn("contrib", F.col("qtf") * F.log(p))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def score_lm_kl(
    index: FulltextIndex, qterms: DataFrame, mu: float = 2000.0
) -> DataFrame:
    """Negative KL divergence -KL(Q||D) with an MLE query model over the
    Dirichlet-smoothed doc model (language_model_retrieval.py:415-455).
    Rank-equivalent to query likelihood up to the query-entropy constant;
    scores differ, which is why it ships as its own scorer."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    qlen = qterms.groupBy("query_id").agg(
        F.sum("qtf").cast("double").alias("qlen")
    )
    scored = _lm_cross(index, qterms).join(F.broadcast(qlen), "query_id")
    p_q = F.col("qtf") / F.col("qlen")
    p_d = (F.col("tf") + mu * F.col("p_c")) / (F.col("dl") + F.lit(mu))
    return (
        scored.withColumn("contrib", -p_q * F.log(p_q / p_d))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
