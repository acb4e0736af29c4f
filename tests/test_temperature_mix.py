from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.curation import temperature_mix


def _docs(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_alpha_one_keeps_everything(spark):
    d = _docs(spark, {"a": 40, "b": 10})
    out, rates = temperature_mix(d, alpha=1.0)
    assert rates == {"a": 1.0, "b": 1.0}
    assert out.count() == 50


def test_smallest_source_is_never_downsampled(spark):
    d = _docs(spark, {"big": 160, "small": 10})
    out, rates = temperature_mix(d, alpha=0.5)
    assert rates["small"] == 1.0
    assert rates["big"] == pytest.approx((160 / 10) ** -0.5)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert kept["small"] == 10
    # big is kept at the /256-quantized rate: expected 160 * 64/256 = 40
    # in distribution; the md5 sampler is deterministic so just bound it.
    assert 0 < kept.get("big", 0) < 160


def test_mix_moves_toward_tempered_shares(spark):
    # natural shares 16:1 → alpha=0.5 targets 4:1; the realized ratio
    # must land far below natural and near the target.
    d = _docs(spark, {"big": 320, "small": 20})
    out, _ = temperature_mix(d, alpha=0.5)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    ratio = kept["big"] / kept["small"]
    assert 2.0 < ratio < 8.0


def test_mark_only_flags_instead_of_filtering(spark):
    d = _docs(spark, {"a": 30, "b": 10})
    flagged, _ = temperature_mix(d, alpha=0.5, mark_only=True)
    assert flagged.count() == 40
    filtered, _ = temperature_mix(d, alpha=0.5)
    assert filtered.count() == flagged.filter(F.col("kept") == 1).count()


def test_determinism_across_partitionings(spark):
    d = _docs(spark, {"a": 100, "b": 25})
    one, _ = temperature_mix(d.repartition(1), alpha=0.5)
    many, _ = temperature_mix(d.repartition(16), alpha=0.5)
    assert sorted(r["doc_id"] for r in one.collect()) == sorted(
        r["doc_id"] for r in many.collect()
    )


def test_alpha_validation(spark):
    d = _docs(spark, {"a": 4})
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(d, alpha=0.0)
