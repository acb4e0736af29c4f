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


HAC_N, HAC_K, HAC_LINKAGE = 40, 8, "average"


def q_hier_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 hierarchical doc clustering (HAC, doc_cluster.py:252-374) over
    a bounded embedding subset: distributed pairwise cosine, driver-side
    reference-exact merge loop. Sequential agglomeration is not
    SQL-expressible → rows-only; tests/test_hierarchical.py pins the
    linkage semantics on hand-computed geometry."""
    from .ops.cluster import hierarchical_doc_clusters

    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < HAC_N)
        .select("vec_id", "embedding")
    )
    return hierarchical_doc_clusters(
        vecs, k=HAC_K, linkage=HAC_LINKAGE
    ).orderBy("doc_id")


ORACLES: dict[str, str] = {}  # iterative EM / sequential HAC — rows-only


def registry():
    return {"lda_topics": q_lda_topics, "hier_clusters": q_hier_clusters}
