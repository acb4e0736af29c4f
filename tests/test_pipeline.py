"""End-to-end curation pipeline (ops/pipeline.py): one planted defect per
stage, exact row accounting, redaction and split columns on the output."""

from __future__ import annotations

import pytest

from news_information_retrieval_system_spark.ops.pipeline import curate_corpus

GOOD_A = "the quick brown fox jumps over the lazy dog and runs far away today"
GOOD_B = "spark processes big data with many partitions and the shuffle is fast"
BENCH_T = "the alpha beta gamma delta epsilon runs over the zeta eta theta field today"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, GOOD_A),                          # kept (canonical of the near-dup pair)
            (1, GOOD_A),                          # exact duplicate of 0
            (2, GOOD_A.replace("today", "now")),  # near-dup of 0 (Jaccard > 0.5)
            (3, "!!! ??? !!!"),                   # junk → quality drop
            (4, GOOD_B),                          # kept
            (5, BENCH_T + " and some more words here"),  # contaminated
            (6, "please send the report to alice@example.com and bob the builder will reply soon after"),  # kept, redacted
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([(100, BENCH_T)], "doc_id long, text string")


def test_pipeline_accounting_and_output(corpus, bench):
    out, stats = curate_corpus(corpus, bench, contamination_min_overlap=3)
    assert stats == {
        "n_input": 7,
        "n_wrong_lang": 0,
        "n_low_quality": 1,
        "n_exact_dup": 1,
        "n_near_dup": 1,
        "n_contaminated": 1,
        "n_kept": 3,
    }
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 4, 6}
    assert "<EMAIL>" in rows[6]["text"]
    assert "alice@example.com" not in rows[6]["text"]
    assert rows[0]["text"] == GOOD_A  # untouched text passes through
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


def test_pipeline_completeness_lsh_config(corpus, bench):
    """bands == num_hashes (rows-per-band 1) is the configuration the
    end-to-end accounting oracle runs — same drops as default banding."""
    _, stats = curate_corpus(
        corpus, bench, contamination_min_overlap=3, num_hashes=32, bands=32
    )
    assert stats == {
        "n_input": 7,
        "n_wrong_lang": 0,
        "n_low_quality": 1,
        "n_exact_dup": 1,
        "n_near_dup": 1,
        "n_contaminated": 1,
        "n_kept": 3,
    }


def test_pipeline_language_gate(corpus, bench):
    """lang_allow drops non-matching docs FIRST (CCNet ordering), and
    the accounting identity still closes exactly."""
    zh = corpus.sparkSession.createDataFrame(
        [(9, "這 是 一 段 中 文 轉 錄 內 容 的 測 試 文 字")],
        "doc_id long, text string",
    )
    _, stats = curate_corpus(
        corpus.unionByName(zh), bench,
        lang_allow={"en", "en-ish"}, contamination_min_overlap=3,
    )
    # both the zh doc AND the all-punctuation junk doc ('unk' script)
    # fall to the language gate, which runs before the quality floor
    assert stats["n_wrong_lang"] == 2
    assert stats["n_low_quality"] == 0
    assert stats["n_input"] == 8
    assert stats["n_input"] == sum(
        stats[k] for k in ("n_wrong_lang", "n_low_quality", "n_exact_dup",
                           "n_near_dup", "n_contaminated", "n_kept")
    )
    assert stats["n_kept"] == 3


def test_pipeline_without_bench(corpus):
    out, stats = curate_corpus(corpus, None)
    assert stats["n_contaminated"] == 0
    # the contaminated doc passes quality/dedup and is kept without a bench
    assert stats["n_kept"] == 4
    assert out.count() == 4
