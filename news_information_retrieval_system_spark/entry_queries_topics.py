"""Driver-contract entries for topic modeling (A7).

* lda_topics — lda_model.py:222-356 (fit + get_topics): per-topic top
  words from a seeded EM LDA. Iterative Bayesian EM is not
  SQL-expressible, so there is no oracle_sql entry (the driver records
  the weaker rows-only check); tests/test_topics.py pins shape,
  probability sanity, and same-seed determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs

LDA_K, LDA_ITERS, LDA_TOPN, LDA_SEED = 4, 8, 8, 42


def q_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.topics import lda_topics

    out = lda_topics(
        _docs(spark, sf_dir), k=LDA_K, max_iter=LDA_ITERS,
        top_n=LDA_TOPN, seed=LDA_SEED,
    )
    return out.select(
        "topic",
        "rank",
        "term",
        F.round("weight", 6).alias("weight"),
    ).orderBy("topic", "rank")


ORACLES: dict[str, str] = {}  # iterative EM — rows-only by design


def registry():
    return {"lda_topics": q_lda_topics}
