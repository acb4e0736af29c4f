"""Token-level frequent-pattern mining with Mutual Information scoring.

Reference: src/ir/patterns/pat_tree.py — the token-level PAT tree inserts
every suffix of every document (:166-234), collects patterns of length
[min_pattern_length, max_pattern_length] with frequency ≥ min_frequency
(:236-314), and ranks them by generalized MI
``log2(P(w1..wn) / (P(w1)·…·P(wn)))`` with P(x) = freq(x) / total_tokens
(:316-365). The suffix tree is the single-node data structure; the
*quantity* it computes is exactly "corpus-wide occurrence counts of every
n-gram in a length band", which at scale is an explode + groupBy — no
tree, no O(n²) construction, same numbers.

Plan shape: per n one narrow array-transform explode + one count groupBy
(partial agg map-side); unigram counts and the token total come from the
n=1 pass; MI is an inner join of the exploded pattern tokens against the
unigram table (shuffle on term, skew-safe — hot unigrams join against at
most n_max rows per pattern) followed by one groupBy. Everything stays in
whole-stage codegen; log2 sums quantize to the repo-wide 5dp fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .collocation import ngram_counts

SCALE = 100_000


def mi_patterns(
    docs: DataFrame,
    n_min: int = 2,
    n_max: int = 3,
    min_freq: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (pattern, n, freq, mi_5dp) for every word n-gram with
    n ∈ [n_min, n_max] and corpus frequency ≥ min_freq.

    MI follows pat_tree.py:316-365 exactly:
    ``log2(f·N^(n-1) / Π f_wi)`` with N = total token occurrences and
    f_wi the unigram occurrence counts (repeated tokens counted per
    occurrence, as the reference's product over ``pattern.tokens`` does).
    """
    if n_min < 2:
        raise ValueError("patterns need n >= 2 (MI of a unigram is 0)")
    uni = ngram_counts(docs, 1, text_col, id_col).select(
        F.col("ngram").alias("term"), F.col("cnt").alias("uf")
    )
    total = uni.agg(F.sum("uf").cast("double").alias("n_tokens"))

    parts = []
    for n in range(n_min, n_max + 1):
        parts.append(
            ngram_counts(docs, n, text_col, id_col)
            .filter(F.col("cnt") >= min_freq)
            .select(
                F.col("ngram").alias("pattern"),
                F.lit(n).cast("int").alias("n"),
                F.col("cnt").cast("long").alias("freq"),
            )
        )
    pats = parts[0]
    for p in parts[1:]:
        pats = pats.unionByName(p)

    toks = pats.select(
        "pattern", "n", "freq", F.explode(F.split("pattern", " ")).alias("term")
    )
    sums = (
        toks.join(uni, "term")
        .groupBy("pattern", "n", "freq")
        .agg(F.sum(F.log2("uf")).alias("sum_log_uf"))
    )
    mi = (
        F.log2(F.col("freq"))
        + (F.col("n") - 1) * F.log2(F.col("n_tokens"))
        - F.col("sum_log_uf")
    )
    return sums.crossJoin(F.broadcast(total)).select(
        "pattern",
        "n",
        "freq",
        F.round(mi * SCALE).cast("long").alias("mi_5dp"),
    )
