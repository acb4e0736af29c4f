"""Corpus audit rollups (reference corpus_audit_service).

Reference: src/ir_app/services/corpus_audit_service.py — ``audit()``
(:45-96) assembles per-field metadata completeness (:98-135 with the
0.95/0.75 status thresholds of :136-147), top value distributions with a
``missing`` bucket (:149-173), compact numeric length stats (:225-240)
and post-load dedup-hash stats (:241-256) by looping over every document
dict on one node. Here each payload is a single declarative aggregation
over the corpus table.

Scale shape: ``field_completeness`` is ONE pass — a single global agg
computing every per-field sum map-side, then an ``inline`` unpivot of
the one aggregate row into per-field rows (no per-field jobs, no
shuffle beyond the final single-row reduce). ``value_distribution`` is
one groupBy + TakeOrdered; ``dedup_stats`` one agg over a hash groupBy.
No UDFs, no driver loops over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_GOOD = 0.95  # corpus_audit_service.py:143-147
STATUS_WATCH = 0.75
SCALE = 100_000


def coverage_status(ratio_col: F.Column) -> F.Column:
    """Reference display status: good ≥ 0.95 > watch ≥ 0.75 > needs_work
    (corpus_audit_service.py:136-147)."""
    return (
        F.when(ratio_col >= STATUS_GOOD, F.lit("good"))
        .when(ratio_col >= STATUS_WATCH, F.lit("watch"))
        .otherwise(F.lit("needs_work"))
    )


def field_completeness(df: DataFrame, fields: list[str]) -> DataFrame:
    """→ one row per audited field: (field, present, missing,
    coverage_5dp, status, mean_len_5dp, max_len).

    ``missing`` mirrors ``_missing_fields`` (:98-112): NULL or ''.
    Length stats mirror ``audit()``'s content_chars sample (:57): the
    char length of ``str(value or '')`` over ALL rows, so missing rows
    count as 0-length — the same population the reference measures.
    """
    aggs = [F.count("*").alias("_total")]
    for f in fields:
        miss = F.col(f).isNull() | (F.col(f) == "")
        ln = F.length(F.coalesce(F.col(f), F.lit("")))
        aggs.append(F.sum(miss.cast("long")).alias(f"_m_{f}"))
        aggs.append(F.sum(ln.cast("long")).alias(f"_sl_{f}"))
        aggs.append(F.max(ln).alias(f"_xl_{f}"))
    one = df.agg(*aggs)

    # unpivot the single aggregate row: inline(array(struct(...), ...))
    structs = [
        F.struct(
            F.lit(f).alias("field"),
            (F.col("_total") - F.col(f"_m_{f}")).alias("present"),
            F.col(f"_m_{f}").alias("missing"),
            F.col(f"_sl_{f}").alias("_sum_len"),
            F.col(f"_xl_{f}").cast("long").alias("max_len"),
            F.col("_total").alias("_total"),
        )
        for f in fields
    ]
    rows = one.select(F.inline(F.array(*structs)))
    cov = F.col("present") / F.col("_total")
    return rows.select(
        "field",
        "present",
        "missing",
        F.round(cov * SCALE).cast("long").alias("coverage_5dp"),
        coverage_status(cov).alias("status"),
        F.round(F.col("_sum_len") / F.col("_total") * SCALE)
        .cast("long")
        .alias("mean_len_5dp"),
        "max_len",
    )


def value_distribution(df: DataFrame, field: str, limit: int = 12) -> DataFrame:
    """→ (value, count, ratio_5dp) — top ``limit`` values by count desc
    then value asc, NULL/'' folded into a ``missing`` bucket
    (``_distribution``, corpus_audit_service.py:149-173; the reference's
    most_common ties are arbitrary, the value-asc tiebreak makes ours
    deterministic)."""
    total = df.count()
    val = F.when(
        F.col(field).isNull() | (F.col(field) == ""), F.lit("missing")
    ).otherwise(F.col(field).cast("string"))
    return (
        df.select(val.alias("value"))
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("count"))
        .withColumn(
            "ratio_5dp",
            F.round(F.col("count") / F.lit(total) * SCALE).cast("long"),
        )
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(limit)
    )


def dedup_stats(df: DataFrame, hash_col: F.Column | str = None) -> DataFrame:
    """→ (dedup_hashes, unique_hashes, duplicate_hashes) — the reference's
    post-load duplicate-hash report (``_dedup_stats``, :241-256), with
    the hash defaulting to md5(text) when no precomputed column exists."""
    h = F.md5(F.col("text")) if hash_col is None else (
        F.col(hash_col) if isinstance(hash_col, str) else hash_col
    )
    return df.select(h.alias("h")).agg(
        F.count("h").cast("long").alias("dedup_hashes"),
        F.countDistinct("h").cast("long").alias("unique_hashes"),
        (F.count("h") - F.countDistinct("h")).cast("long").alias("duplicate_hashes"),
    )
