"""No-result query suggestions from the term dictionary.

Reference parity: SearchService.suggestions
(/root/reference/src/ir_app/services/search_service.py:750-789) returns
fallback rewrites when a query yields nothing: fuzzy neighbors of the
query terms plus expansion variants (its synonym/csoundex sources are
Chinese-news-specific static maps — non-goals here; the term-dictionary
sources below are the general mechanism).

Spark shape: the "vocabulary" IS ``index.term_stats`` — suggestions per
unmatched term are one broadcast join of the (tiny) query-term frame
against it with built-in ``levenshtein`` / ``startswith`` predicates, a
window top-``cap``, no UDFs. On a 10^12-turn corpus the term dictionary
is still only O(vocab) rows, so this stays a broadcast-scale operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import FulltextIndex


def query_suggestions(
    index: FulltextIndex,
    qterms: DataFrame,
    max_distance: int = 2,
    prefix_len: int = 4,
    cap: int = 5,
    only_missing: bool = True,
) -> DataFrame:
    """qterms(query_id, term) → (query_id, term, kind, suggestion, df,
    rank): up to ``cap`` vocabulary terms per (query term, kind), where
    kind ∈ {fuzzy, prefix}.

    * fuzzy  — levenshtein(term, vocab) ≤ max_distance, the reference's
      _fuzzy_expansion source (fuzzy.py:63-213), ordered dist asc, df
      desc, term asc;
    * prefix — vocab starting with the term's first ``prefix_len`` chars
      (the PAT-tree prefix walk, pat_tree.py:268-301, as a range scan),
      ordered df desc, term asc; terms shorter than ``prefix_len`` use
      the whole term as the prefix.

    ``only_missing``: suggest only for query terms absent from the
    vocabulary (the no-result trigger); the exact suggestion a user
    needs. Suggestions never echo the query term itself.
    """
    q = qterms.select("query_id", "term").distinct()
    if only_missing:
        q = q.join(
            index.term_stats.select(F.col("term"), F.lit(1).alias("_hit")),
            "term",
            "left",
        ).filter(F.col("_hit").isNull()).drop("_hit")
    vocab = F.broadcast(q).crossJoin(
        index.term_stats.select(F.col("term").alias("suggestion"), "df")
    ).filter(F.col("suggestion") != F.col("term"))

    fuzzy = (
        vocab.withColumn("dist", F.levenshtein("term", "suggestion"))
        .filter(F.col("dist") <= max_distance)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id", "term").orderBy(
                    F.asc("dist"), F.desc("df"), F.asc("suggestion")
                )
            ),
        )
        .filter(F.col("rank") <= cap)
        .select("query_id", "term", F.lit("fuzzy").alias("kind"),
                "suggestion", "df", "rank")
    )
    prefix = (
        vocab.withColumn("_p", F.substring("term", 1, prefix_len))
        .filter(F.col("suggestion").startswith(F.col("_p")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id", "term").orderBy(
                    F.desc("df"), F.asc("suggestion")
                )
            ),
        )
        .filter(F.col("rank") <= cap)
        .select("query_id", "term", F.lit("prefix").alias("kind"),
                "suggestion", "df", "rank")
    )
    return fuzzy.unionByName(prefix)
