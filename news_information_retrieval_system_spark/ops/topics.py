"""Topic modeling: LDA over the corpus (SURVEY §2 A7).

Reference: src/ir/topic/lda_model.py:85-448 — gensim LdaModel wrapper
(n_topics, passes, random_state; get_topics → per-topic (word, weight)
lists, transform → per-doc topic distribution, log-perplexity). The
BERTopic variant (bertopic_model.py) needs sentence-transformer
embeddings — an external model, out of scope here.

Spark shape: ``pyspark.ml.clustering.LDA`` over term-frequency vectors.
Tokens → CountVectorizer (JVM) → LDA; ``optimizer="em"`` with a fixed
seed runs Bayesian EM on the document-term graph (distributed, no
driver-side corpus materialization — this is the 100 TB path: gensim
streams one process, Spark's EM LDA partitions the corpus). Seeded runs
reproduce topic identities and dominant terms; per-weight values carry
~1e-3 float jitter from distributed aggregation order (measured,
tests/test_topics.py), the same caveat gensim documents for
multi-worker runs. Topic export mirrors the reference's ``get_topics``
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col


def fit_lda(
    docs: DataFrame,
    k: int = 5,
    max_iter: int = 20,
    vocab_size: int = 1 << 16,
    min_df: float = 1.0,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Fit LDA. → (model, vocab: list[str], featurized DataFrame with
    columns (doc_id, fvec)). ``optimizer="em"`` for determinism at a
    fixed seed (the online optimizer subsamples minibatches)."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tokens")
    )
    cv = CountVectorizer(
        inputCol="tokens", outputCol="fvec", vocabSize=vocab_size, minDF=min_df
    ).fit(toks)
    feats = cv.transform(toks).select("doc_id", "fvec")
    lda = LDA(
        k=k,
        maxIter=max_iter,
        seed=seed,
        optimizer="em",
        featuresCol="fvec",
    )
    model = lda.fit(feats)
    return model, list(cv.vocabulary), feats


def lda_topics(
    docs: DataFrame,
    k: int = 5,
    max_iter: int = 20,
    top_n: int = 10,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (topic, rank, term, weight): per-topic top-``top_n`` words, the
    reference's ``get_topics`` payload (lda_model.py:335-356). Ties break
    weight desc, then vocabulary index (describeTopics order)."""
    model, vocab, _ = fit_lda(
        docs, k=k, max_iter=max_iter, seed=seed,
        text_col=text_col, id_col=id_col,
    )
    spark = docs.sparkSession
    vocab_df = spark.createDataFrame(
        list(enumerate(vocab)), "term_id long, term string"
    )
    desc = model.describeTopics(maxTermsPerTopic=top_n).select(
        "topic",
        F.posexplode("termIndices").alias("pos", "tid"),
        "termWeights",
    )
    return (
        desc.select(
            F.col("topic").cast("long").alias("topic"),
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("tid").cast("long").alias("term_id"),
            F.element_at("termWeights", F.col("pos") + 1).alias("weight"),
        )
        .join(F.broadcast(vocab_df), "term_id")
        .select("topic", "rank", "term", "weight")
    )


def lda_doc_topics(
    docs: DataFrame,
    k: int = 5,
    max_iter: int = 20,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, topic, proportion): each document's dominant topic —
    the reference ``transform`` payload (lda_model.py:286-333) reduced to
    its argmax row per doc."""
    from pyspark.ml.functions import vector_to_array

    model, _, feats = fit_lda(
        docs, k=k, max_iter=max_iter, seed=seed,
        text_col=text_col, id_col=id_col,
    )
    dist = model.transform(feats).select(
        "doc_id", vector_to_array("topicDistribution").alias("td")
    )
    arr = F.col("td")
    return dist.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(
            "array_position(td, array_max(td)) - 1"
        ).cast("long").alias("topic"),
        F.array_max(arr).alias("proportion"),
    )
