"""Model-based quality filtering: hashed-feature logistic classifier.

Completes the curation-quality triad: heuristics (ops/textstats.py
quality_features, reference text-quality semantics), perplexity flags
(entry ppx_quality, CCNet-style), and THIS — the fastText-style trained
filter every production pipeline runs (RefinedWeb/CCNet train a linear
model on weak "good vs junk" labels over hashed token features and score
the whole corpus with it). The reference has no trained filter; its
nearest op is the heuristic quality gate (ops/textstats.py cites it) —
this module is a first-class LLM-pipeline addition, like ops/semdedup.py.

Representation: hashed token-unigram counts. bucket(term) =
(md5 first hex digit ·16 + second hex digit) mod ``n_buckets`` — the same
hex-digit-via-instr() trick as ops/curation.py's salted-md5 shards, so an
independent SQL engine reproduces the feature matrix byte-for-byte
without hex→int casts. Collisions are the point (hashing trick): the
dimensionality is fixed no matter how large the vocabulary grows.

Split of concerns at scale:
* TRAINING is the small offline job — pyspark.ml LogisticRegression over
  the featurized sample (L-BFGS, L2; deterministic for a given dataset,
  gated by a coefficient drift-gate like ops/ltr.py's).
* SCORING is the 100 TB pass — ``quality_score`` is pure Column algebra
  (features → broadcast weight join → one multiply-add per bucket), no
  Python, no ML runtime, exactly reproducible from the pinned weights.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def bucket_sql(term_expr: str, n_buckets: int) -> str:
    """Portable (Spark SQL ≡ DuckDB) hashed-bucket expression for a term."""
    return (
        f"((instr('{_HEX}', substr(md5({term_expr}), 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr(md5({term_expr}), 2, 1)) - 1)) % {n_buckets}"
    )


def hashed_token_features(
    docs: DataFrame,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, bucket, cnt): sparse hashed-unigram counts, one narrow
    explode + one groupBy — the minimal featurization scan."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    return (
        toks.withColumn("bucket", F.expr(bucket_sql("term", n_buckets)))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _dense(feats: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, bucket, cnt) → (doc_id, fvec array<double>) via a per-doc
    bucket→cnt map expanded over a static index sequence (JVM-only)."""
    m = feats.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", F.col("cnt").cast("double")))
        ).alias("m")
    )
    fvec = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
    )
    return m.select("doc_id", fvec.alias("fvec"))


def quality_train(
    docs: DataFrame,
    n_buckets: int = 32,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    reg: float = 0.1,
    max_iter: int = 50,
) -> tuple[DataFrame, dict]:
    """Fit the filter on a labeled corpus (label 1 = junk/reject). →
    (coefs_df(bucket, coefficient) with bucket -1 = intercept, report).
    L2-regularized so separable planted labels keep finite weights."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    spark = docs.sparkSession
    feats = hashed_token_features(
        docs, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    dense = _dense(feats, n_buckets).join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(label_col).alias("label")),
        "doc_id",
    )
    train = dense.select(
        "doc_id", array_to_vector("fvec").alias("features"), F.col("label").cast("double")
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg, elasticNetParam=0.0, family="binomial"
    )
    model = lr.fit(train)
    rows = [(-1, float(model.intercept))] + [
        (i, float(w)) for i, w in enumerate(model.coefficients)
    ]
    coefs = spark.createDataFrame(rows, "bucket int, coefficient double")
    pred = model.transform(train)
    acc = pred.filter(F.col("prediction") == F.col("label")).count() / max(
        pred.count(), 1
    )
    return coefs, {"rows": train.count(), "training_accuracy": acc}


def quality_score(
    feats: DataFrame,
    weights: Mapping[int, float],
    intercept: float,
) -> DataFrame:
    """(doc_id, bucket, cnt) + pinned weights → (doc_id, logit, pred):
    logit = intercept + Σ_b w_b · cnt_b, pred = 1 iff logit > 0. Pure
    Column algebra — the weight table is a broadcast |buckets|-row join;
    this is the plan that scores the full corpus."""
    spark = feats.sparkSession
    wdf = spark.createDataFrame(
        [(int(b), float(w)) for b, w in weights.items()],
        "bucket int, w double",
    )
    return (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.lit(float(intercept))
                + F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("cnt"))
            ).alias("logit")
        )
        .select(
            "doc_id",
            "logit",
            F.when(F.col("logit") > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
        )
    )
