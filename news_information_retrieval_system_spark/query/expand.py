"""Query-term expansion: wildcard and fuzzy (edit-distance).

Reference: wildcard glob → regex scan over vocabulary, cap 50 expansions
(src/ir/retrieval/wildcard.py:59-201); fuzzy Levenshtein DP against the
whole vocabulary, max_distance default 1-2, cap 50
(src/ir/retrieval/fuzzy.py:63-213).

Spark: the vocabulary IS the term_stats table; expansion is a filter with
the built-in ``levenshtein``/``rlike`` — JVM-side, no UDF. Expanded terms
then feed any ranker as extra (query_id, term) rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex


def wildcard_terms(index: FulltextIndex, pattern: str, cap: int = 50) -> DataFrame:
    rx = "^" + re.escape(pattern).replace(r"\*", ".*").replace(r"\?", ".") + "$"
    return (
        index.term_stats.filter(F.col("term").rlike(rx))
        .orderBy("term")
        .limit(cap)
        .select("term")
    )


def fuzzy_terms(index: FulltextIndex, term: str, max_distance: int = 1, cap: int = 50) -> DataFrame:
    """Deterministic order: distance asc, df desc, term asc (closest and
    most frequent expansions first — reference fuzzy.py ordering)."""
    t = term.lower()
    return (
        index.term_stats.withColumn("dist", F.levenshtein(F.lit(t), F.col("term")))
        .filter(F.col("dist") <= max_distance)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(cap)
        .select("term", "dist")
    )


def expand_qterms(
    index: FulltextIndex, qterms: DataFrame, max_distance: int = 1, cap: int = 50
) -> DataFrame:
    """Fuzzy-expand every query term (reference model=fuzzy path,
    search_service.py:384-411): each query term is replaced by all
    vocabulary terms within edit distance, qtf preserved."""
    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    vocab = index.term_stats.select(F.col("term").alias("vterm"), "df")
    pairs = (
        vocab.join(
            F.broadcast(qterms.select("query_id", "term", "qtf")),
            F.levenshtein(F.col("vterm"), F.col("term")) <= max_distance,
        )
        .withColumn("dist", F.levenshtein(F.col("vterm"), F.col("term")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id", "term").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("vterm")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("query_id", F.col("vterm").alias("term"), "qtf")
        .distinct()
    )
