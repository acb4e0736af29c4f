from __future__ import annotations

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.quality_model import (
    hashed_token_features,
    quality_score,
    quality_train,
)


def _labeled(spark):
    rows = []
    for i in range(24):
        if i % 3 == 0:
            rows.append((i, "zz1 zz2 zz3 zz1 zz2 zz3 zz1 zz2", 1.0))
        else:
            rows.append((i, "spark index fast scan table batch row agg", 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_features_are_bucketed_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "")], "doc_id long, text string"
    )
    out = hashed_token_features(docs, n_buckets=8).collect()
    assert all(0 <= r["bucket"] < 8 for r in out)
    assert sum(r["cnt"] for r in out if r["doc_id"] == 0) == 3
    assert not [r for r in out if r["doc_id"] == 1]  # empty doc → no rows


def test_train_separates_planted_junk(spark):
    docs = _labeled(spark)
    coefs, report = quality_train(docs, n_buckets=16, reg=0.01)
    assert report["training_accuracy"] == 1.0
    w = {r["bucket"]: r["coefficient"] for r in coefs.collect()}
    feats = hashed_token_features(docs, n_buckets=16)
    scored = quality_score(
        feats, {b: c for b, c in w.items() if b >= 0}, intercept=w[-1]
    )
    joined = scored.join(docs.select("doc_id", "label"), "doc_id")
    wrong = joined.filter(F.col("pred") != F.col("label").cast("int")).count()
    assert wrong == 0


def test_score_is_linear_in_counts(spark):
    # Doubling every count doubles (logit - intercept): the scoring path
    # is exactly the pinned linear form.
    docs = spark.createDataFrame([(0, "x y z x")], "doc_id long, text string")
    feats = hashed_token_features(docs, n_buckets=4)
    w = {0: 0.5, 1: -0.25, 2: 1.0, 3: 0.125}
    one = quality_score(feats, w, intercept=0.0).collect()[0]["logit"]
    doubled = feats.withColumn("cnt", F.col("cnt") * 2)
    two = quality_score(doubled, w, intercept=0.0).collect()[0]["logit"]
    assert abs(two - 2 * one) < 1e-12
