"""End-to-end training-data curation pipeline: the composition a 100 TB
corpus actually runs, built from the already-audited operators.

    quality filter → exact dedup (keep-first) → near-dup dedup
    (MinHash LSH → connected components, keep canonical) →
    benchmark decontamination → PII redaction → split assignment

Every stage is one of the individually oracle-checked ops (textstats,
dedup, curation), so the pipeline adds composition + row accounting, not
new semantics. Scale shape: each stage is a narrow pass, a broadcast
join, or the banded LSH + label-propagation pair already audited for
100 TB; the only driver-side data is the per-stage counts.

Row accounting is exact and disjoint by construction (stages apply in
order, each drop counted once):

    n_input = n_wrong_lang + n_low_quality + n_exact_dup
              + n_near_dup + n_contaminated + n_kept

Execution shape — SINGLE-PASS drop-reason design: instead of
materializing and counting each stage's survivor frame (six
full-corpus actions and five persisted intermediates), every stage
contributes a FLAG column on one cached frame and a row's drop reason
is its first failing stage; the whole accounting is ONE aggregation.
The sequential semantics are preserved exactly:

* the exact-dedup winner is the first ELIGIBLE (lang+quality-passing)
  doc_id per content hash — a cumulative eligible-count window, so
  an ineligible doc can never steal the slot;
* MinHash pairs are generated over exact-dedup survivors only (the
  candidate frame is a lazy filter of the cached base — no extra
  materialization);
* contamination overlap is per-doc against the broadcast benchmark
  dictionary, so computing it pre-filter is value-identical, and the
  flag only fires for rows that survived every earlier stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import (
    EMAIL_RE,
    assign_splits,
    benchmark_contamination,
)
from .dedup import content_hash_col, dup_components, minhash_lsh_pairs
from .textstats import quality_score_col


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    lang_allow: set[str] | None = None,
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    contamination_min_overlap: int = 5,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    train: float = 0.8,
    val: float = 0.1,
    redact_pii: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the full curation pipeline over ``docs`` (needs ``doc_id`` and
    ``text`` columns; other columns pass through). Returns the curated
    DataFrame (text redacted, ``split`` column added) and the per-stage
    accounting dict. Single-pass drop-reason execution (see module
    docstring): one cached flag frame, ONE accounting aggregation, and
    the returned frame reads the same cache."""
    # 0+1. row-local gates (CCNet ordering: lang-ID before quality) —
    # flags, zero shuffle
    if lang_allow is not None:
        from .textstats import lang_id_col

        lang_ok = lang_id_col(F.col("text")).isin(*sorted(lang_allow))
    else:
        lang_ok = F.lit(True)
    q_ok = quality_score_col(F.col("text")) >= min_quality

    # 2. exact dedup: the winner is the FIRST ELIGIBLE doc_id per
    # content hash — cumulative eligible count over the hash partition
    # ordered by doc_id (an ineligible doc never steals the slot, and
    # no filter/materialization is needed to express "among survivors")
    w = (
        Window.partitionBy("_h")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the ONE cached frame — helper columns consumed by _exact_keep are
    # dropped before persist so the cache carries only text + 3 booleans
    # beyond the input (wide caches under a lazily-grown heap are this
    # host's documented fault-storm trigger)
    flagged = (
        docs.withColumn("_lang_ok", lang_ok)
        .withColumn("_q_ok", F.col("_lang_ok") & q_ok)
        .withColumn("_h", content_hash_col(F.col("text")))
        .withColumn(
            "_erk",
            F.sum(F.when(F.col("_q_ok"), 1).otherwise(0)).over(w),
        )
        .withColumn("_exact_keep", F.col("_q_ok") & (F.col("_erk") == 1))
        .drop("_h", "_erk")
        .persist()
    )

    # 3. near-dup over exact-dedup survivors: banded MinHash candidates,
    # exact-Jaccard verify, transitive closure via label propagation,
    # keep the canonical (min doc_id) member of each component. Default
    # banding (16/4) bounds candidate volume at scale; the completeness
    # configuration (bands == num_hashes, rows-per-band 1) makes the
    # verified output equal the exact Jaccard set — used by the
    # end-to-end accounting oracle. The candidate frame is a lazy
    # filter of the cached base.
    pairs = minhash_lsh_pairs(
        flagged.filter(F.col("_exact_keep")),
        k=shingle_k,
        threshold=jaccard_threshold,
        num_hashes=num_hashes,
        bands=bands,
    )
    comp = dup_components(pairs)
    non_canonical = (
        comp.filter(F.col("doc_id") != F.col("component"))
        .select("doc_id", F.lit(True).alias("_near_drop"))
    )
    flagged2 = flagged.join(non_canonical, "doc_id", "left")

    # 4. benchmark decontamination flag (broadcast shingle-overlap
    # count; per-doc against the benchmark dictionary, so value-
    # identical computed pre-filter — the flag only FIRES for rows
    # that survived every earlier stage, preserving disjoint counts)
    if bench is not None:
        contaminated = (
            benchmark_contamination(docs, bench, k=shingle_k)
            .filter(F.col("n_overlap") >= contamination_min_overlap)
            .select("doc_id", F.lit(True).alias("_contam"))
        )
        flagged2 = flagged2.join(contaminated, "doc_id", "left")
    else:
        flagged2 = flagged2.withColumn("_contam", F.lit(None).cast("boolean"))

    reason = (
        F.when(~F.col("_lang_ok"), "wrong_lang")
        .when(~F.col("_q_ok"), "low_quality")
        .when(~F.col("_exact_keep"), "exact_dup")
        .when(F.col("_near_drop"), "near_dup")
        .when(F.col("_contam"), "contaminated")
        .otherwise("kept")
    )
    # NOT persisted: both the accounting aggregation and the returned
    # frame re-evaluate this join tree over the flagged CACHE — the
    # flag/comp sides are tiny broadcasts, so a recompute is two cheap
    # map-side joins, far cheaper than a second corpus-wide cache write.
    final = flagged2.withColumn("_reason", reason)

    # ONE accounting action (materializes the flagged cache as a side
    # effect). `flagged` and `comp` stay persisted — they back the
    # returned frame's lineage; both are caller-lifetime caches like
    # dup_components' labels (comp is vocab-of-dup-groups sized).
    acct = {
        r["_reason"]: r["n"]
        for r in final.groupBy("_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stats = {
        "n_input": sum(acct.values()),
        "n_wrong_lang": acct.get("wrong_lang", 0),
        "n_low_quality": acct.get("low_quality", 0),
        "n_exact_dup": acct.get("exact_dup", 0),
        "n_near_dup": acct.get("near_dup", 0),
        "n_contaminated": acct.get("contaminated", 0),
        "n_kept": acct.get("kept", 0),
    }

    out = final.filter(F.col("_reason") == "kept").drop(
        "_lang_ok", "_q_ok", "_exact_keep", "_near_drop", "_contam", "_reason",
    )

    # 5. PII scrub (one JVM regex pass, text replaced in place — no join)
    if redact_pii:
        out = out.withColumn(
            "text", F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
        )

    # 6. deterministic split assignment
    return assign_splits(out, train=train, val=val), stats
