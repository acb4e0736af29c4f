"""Batch-3 operator tests: linear fusion, LSH pair recall, fingerprints,
multimodal feature plumbing. Cross-engine value checks for the batch-3
driver queries live in tests/run_oracle_harness.py (all registered
entries); these tests cover properties the oracle can't express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_linear_fuse_hand_computed(spark):
    """minmax-normalized weighted CombSUM on a tiny hand-checked case."""
    from news_information_retrieval_system_spark.query.hybrid import linear_fuse

    r1 = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 2, 5.0), ("q", 3, 0.0)],
        "query_id string, doc_id long, score double",
    )
    r2 = spark.createDataFrame(
        [("q", 2, 2.0), ("q", 3, 1.0)],
        "query_id string, doc_id long, score double",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in linear_fuse([(r1, 0.6), (r2, 0.4)]).collect()
    }
    # r1 minmax: doc1=1, doc2=0.5, doc3=0; r2 minmax: doc2=1, doc3=0
    assert out[1] == pytest.approx(0.6)
    assert out[2] == pytest.approx(0.6 * 0.5 + 0.4 * 1.0)
    assert out[3] == pytest.approx(0.0)


def test_linear_fuse_degenerate_single_score(spark):
    """max==min within a query → all scores normalize to 1.0, matching the
    reference _normalize_scores for an all-identical list
    (src/ir/ranking/hybrid.py:241-270); no NaN/div0."""
    from news_information_retrieval_system_spark.query.hybrid import linear_fuse

    r1 = spark.createDataFrame(
        [("q", 1, 3.0)], "query_id string, doc_id long, score double"
    )
    rows = linear_fuse([(r1, 1.0)]).collect()
    assert len(rows) == 1 and rows[0]["score"] == pytest.approx(1.0)


def test_lsh_pairs_find_planted_near_dups(spark):
    """Planted near-duplicate vectors must share an LSH bucket and surface
    as candidate pairs (the scale path of embedding dedup)."""
    from news_information_retrieval_system_spark.ops.similarity import (
        _dot,
        _norm_col,
        make_bucket_udf,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 5 near-dups: vec 100+i = vec i + tiny noise
    for i in range(5):
        rows.append((100 + i, [float(x) for x in base[i] + 1e-3 * rng.standard_normal(16)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    bucket = make_bucket_udf(16, n_planes=8, seed=42)
    v = vecs.select("vec_id", F.col("embedding").alias("va")).withColumn(
        "bucket", bucket(F.col("va"))
    ).withColumn("na", _norm_col(F.col("va")))
    w = v.select(
        F.col("vec_id").alias("ib"),
        F.col("va").alias("vb"),
        F.col("bucket").alias("bucket_b"),
        F.col("na").alias("nb"),
    )
    pairs = (
        v.join(w, (F.col("vec_id") < F.col("ib")) & (F.col("bucket") == F.col("bucket_b")))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") > 0.99)
        .select("vec_id", "ib")
        .collect()
    )
    found = {(r["vec_id"], r["ib"]) for r in pairs}
    planted = {(i, 100 + i) for i in range(5)}
    # near-identical vectors agree on every hyperplane sign w.h.p.
    assert len(found & planted) >= 4


def test_fingerprint_deterministic_and_discriminative():
    from news_information_retrieval_system_spark.ops.textstats import (
        rolling_fingerprint_udf,
    )

    fn = rolling_fingerprint_udf.func  # unwrap pandas_udf
    texts = pd.Series(
        ["the quick brown fox jumps over the lazy dog", "a completely different text body here"]
    )
    a = fn(texts.copy())
    b = fn(texts.copy())
    assert list(a) == list(b)  # deterministic
    assert a[0] != a[1]  # distinct content → distinct fingerprint
    # winnowing property: appending text can only keep or lower the min-hash
    # (compare in uint64 space — the stored int64 is the raw bit pattern)
    longer = pd.Series([str(texts[0]) + " with an appended tail section"])
    assert fn(longer)[0] % (1 << 64) <= a[0] % (1 << 64)


def test_media_feature_schema_and_determinism(spark):
    from news_information_retrieval_system_spark.ops.multimodal import (
        extract_features,
        synth_media,
    )

    m = synth_media(spark, n=24, seed=42)
    f1 = extract_features(m, fake=True).orderBy("media_id").collect()
    f2 = extract_features(synth_media(spark, n=24, seed=42), fake=True).orderBy(
        "media_id"
    ).collect()
    assert [r["media_id"] for r in f1] == list(range(24))
    assert all(len(r["features"]) == 16 for r in f1)
    assert [r["features"] for r in f1] == [r["features"] for r in f2]


def test_real_decode_path_is_gated(spark):
    from news_information_retrieval_system_spark.ops.multimodal import (
        extract_features,
        synth_media,
    )

    m = synth_media(spark, n=4, seed=1)
    with pytest.raises(Exception):  # NotImplementedError inside the worker
        extract_features(m, fake=False).collect()
