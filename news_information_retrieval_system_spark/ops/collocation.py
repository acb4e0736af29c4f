"""Bigram collocations (PMI / LLR / Dice) and n-gram language models.

Reference: PMI/LLR/χ²/t-score/Dice over bigram counts
(src/ir/langmodel/collocation.py:137-518); n-gram counts + MLE/add-k
probability + perplexity (src/ir/langmodel/ngram.py:128-467).

Spark shape: adjacent-token bigrams come from a JVM transform over the
token array (no positional self-join needed), then it's groupBy counts all
the way down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col


def bigrams_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair occurrence."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    return toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n11, pmi, dice, llr, chi2, t_score) over adjacent bigrams
    — the reference's full measure set (collocation.py:216 PMI, :320 χ²,
    :373 t-score, :412 Dice, plus Dunning LLR).

    ONE corpus pass: the marginals c1/c2 and the bigram total are all
    derived from the (w1, w2) count table — Σ_w2 n11, Σ_w1 n11, Σ n11 —
    instead of re-tokenizing the corpus once per statistic. χ² uses the
    same 2×2 contingency table as LLR (:320-371, (O-E)²/E over four
    cells); the t-score's unigram probabilities use the bigram-slot
    marginals c1/N, c2/N (the standard corpus-linguistics estimator —
    differs from the reference's whole-corpus unigram counts only by
    each document's boundary token). The subtrees share one identical
    shuffle, which Catalyst's ReuseExchange collapses into a single
    exchange in the executed plan."""
    bg = bigrams_df(docs, text_col, id_col)
    n11 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n11"))
    total = n11.agg(F.sum("n11").alias("n_bigrams"))
    c1 = n11.groupBy("w1").agg(F.sum("n11").alias("c1"))
    c2 = n11.groupBy("w2").agg(F.sum("n11").alias("c2"))
    j = (
        n11.filter(F.col("n11") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .join(F.broadcast(total), how="cross")
    )
    p = F.col("n11") / F.col("n_bigrams")
    p1 = F.col("c1") / F.col("n_bigrams")
    p2 = F.col("c2") / F.col("n_bigrams")
    pmi = F.log2(p / (p1 * p2))
    dice = 2.0 * F.col("n11") / (F.col("c1") + F.col("c2"))
    # log-likelihood ratio (Dunning): 2 * Σ O ln(O/E) over the 2x2 table
    n = F.col("n_bigrams").cast("double")
    o11 = F.col("n11").cast("double")
    o12 = F.col("c1") - o11
    o21 = F.col("c2") - o11
    o22 = n - F.col("c1") - F.col("c2") + o11

    def term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    e11 = F.col("c1") * F.col("c2") / n
    e12 = F.col("c1") * (n - F.col("c2")) / n
    e21 = (n - F.col("c1")) * F.col("c2") / n
    e22 = (n - F.col("c1")) * (n - F.col("c2")) / n
    llr = 2.0 * (term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22))

    def chi_cell(o, e):
        return F.when(e > 0, (o - e) * (o - e) / e).otherwise(F.lit(0.0))

    chi2 = (
        chi_cell(o11, e11)
        + chi_cell(o12, e12)
        + chi_cell(o21, e21)
        + chi_cell(o22, e22)
    )
    # t = (P(w1,w2) - P(w1)P(w2)) / sqrt(P(w1,w2) / N)
    t_score = (p - p1 * p2) / F.sqrt(p / n)
    return j.select(
        "w1", "w2", "n11",
        pmi.alias("pmi"),
        dice.alias("dice"),
        llr.alias("llr"),
        chi2.alias("chi2"),
        t_score.alias("t_score"),
    )


def ngram_counts(docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(ngram, cnt) over word n-grams."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
            )
        ).alias("ngram")
    ).filter(F.size(F.split("ngram", " ")) == n)
    return grams.groupBy("ngram").agg(F.count("*").alias("cnt"))


def ngrams_ctx_df(
    docs: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, ctx, w) — one row per n-gram window occurrence, split into
    the (n-1)-token context (space-joined; '' for n=1, the reference's
    empty tuple, ngram.py:170-177) and the predicted word. Pure JVM array
    transform; windows that run past the document end produce a NULL
    predicted word and are filtered."""
    assert n >= 1
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - n + 1, F.lit(1))),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(t, i, n - 1)).alias("ctx"),
            F.element_at(t, i + F.lit(n - 1)).alias("w"),
        ),
    )
    return (
        toks.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.ctx", "g.w")
        .filter(F.col("w").isNotNull())
    )


def ngram_lm_logprob(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 2,
    add_k: float = 1.0,
) -> DataFrame:
    """Add-k smoothed n-gram LM (any n ≥ 1) trained on ``docs``, scored on
    ``eval_docs``: (doc_id, logprob, n_grams, perplexity).

    Reference semantics (ngram.py:128-467): context count = number of
    windows whose first n-1 tokens equal the context (:180-183), which is
    exactly Σ_w of the n-gram count table — ONE training aggregation, the
    context marginal shares its shuffle via ReuseExchange. Laplace/add-k
    P(w|ctx) = (c+k)/(c_ctx+kV) (:259-271); an unseen eval context gets
    c_ctx=0 → k/(kV) = 1/V, the reference's Counter-default behavior.
    Perplexity = exp(-mean ln p) ≡ the reference's 2^(-mean log2 p)
    (:394-421)."""
    train = (
        ngrams_ctx_df(docs, n)
        .groupBy("ctx", "w")
        .agg(F.count("*").alias("c_ng"))
    )
    ctx_counts = train.groupBy("ctx").agg(F.sum("c_ng").alias("c_ctx"))
    vocab_df = (
        docs.select(F.explode(tokens_col("text")).alias("w"))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    ev = ngrams_ctx_df(eval_docs, n)
    scored = (
        ev.join(train, ["ctx", "w"], "left")
        .join(ctx_counts, "ctx", "left")
        .join(F.broadcast(vocab_df), how="cross")
        .fillna({"c_ng": 0, "c_ctx": 0})
        .withColumn(
            "logp",
            F.log((F.col("c_ng") + add_k) / (F.col("c_ctx") + add_k * F.col("vocab"))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("logp").alias("logprob"),
        F.count("*").alias("n_grams"),
        F.exp(-F.sum("logp") / F.count("*")).alias("perplexity"),
    )
