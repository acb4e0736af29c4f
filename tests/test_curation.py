"""Training-data curation ops (ops/curation.py): deterministic splits,
benchmark decontamination, PII redaction, length histogram."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.curation import (
    assign_splits,
    benchmark_contamination,
    pii_email_redact,
    split_col,
    token_length_buckets,
)


def _expected_split(doc_id: int, b1: str = "cc", b2: str = "e6") -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    return "train" if h < b1 else ("val" if h < b2 else "test")


def test_split_assignment_matches_python_md5(mini_docs):
    rows = assign_splits(mini_docs).select("doc_id", "split").collect()
    assert len(rows) == 8
    for r in rows:
        assert r["split"] == _expected_split(r["doc_id"]), r


def test_split_is_partitioning_invariant(spark):
    """The same id gets the same split at any parallelism — the property
    that makes splits reproducible across pipeline re-runs."""
    ids = spark.range(0, 1000)
    a = {r["id"]: r["s"] for r in ids.coalesce(1).select("id", split_col("id").alias("s")).collect()}
    b = {r["id"]: r["s"] for r in ids.repartition(7).select("id", split_col("id").alias("s")).collect()}
    assert a == b
    # boundary sanity: ~80/10/10 within md5-uniformity tolerance
    n_train = sum(1 for v in a.values() if v == "train")
    assert 700 < n_train < 900


def test_contamination_counts_distinct_shared_shingles(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # shares 'alpha beta gamma' and 'beta gamma delta' → 2
            (0, "alpha beta gamma delta zeta"),
            # repeats the same contaminated trigram — distinct ⇒ still 1
            (1, "alpha beta gamma eta alpha beta gamma"),
            (2, "no shared trigrams here at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in benchmark_contamination(docs, bench, k=3).collect()
    }
    assert got == {0: 2, 1: 1}


def test_pii_email_redaction(spark):
    docs = spark.createDataFrame(
        [
            (0, "write to bob.smith+x@sub.example.com or alice@ex.org now"),
            (1, "no addresses here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_email_redact(docs).collect()}
    assert rows[0]["n_emails"] == 2
    assert rows[0]["redacted"] == "write to <EMAIL> or <EMAIL> now"
    assert rows[1]["n_emails"] == 0
    assert rows[1]["redacted"] == "no addresses here"


def test_token_length_buckets(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a b"), (2, "a b c"), (3, "a b c d"), (4, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {r["bucket"]: (r["n_docs"], r["sum_tokens"]) for r in token_length_buckets(docs).collect()}
    # 1 token → bucket 0; 2-3 → 1; 4-7 → 2; 8 → 3
    assert got == {0: (1, 1), 1: (2, 5), 2: (1, 4), 3: (1, 8)}


def test_split_leakage_detects_cross_split_copies(spark):
    from news_information_retrieval_system_spark.ops.curation import split_leakage

    # md5-bucket splits: 1→train, 3→test (straddling copy = leak);
    # 2→train, 4→train (same-split copy = clean); 5 unique = clean
    a, b = 1, 3
    assert _expected_split(a) != _expected_split(b)
    assert _expected_split(2) == _expected_split(4)
    docs = spark.createDataFrame(
        [(a, "same text"), (b, "same text"), (2, "other"), (4, "other"), (5, "solo")],
        "doc_id long, text string",
    )
    leaks = split_leakage(assign_splits(docs)).collect()
    flagged = {r["min_doc"]: r for r in leaks}
    assert set(flagged) == {a}
    assert flagged[a]["n_docs"] == 2 and flagged[a]["n_splits"] == 2


def test_repetition_stats(spark):
    from news_information_retrieval_system_spark.ops.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            # bigrams: "a b"x3, "b a"x2 → 5 total, 2 distinct, 3 dup
            (0, "a b a b a b"),
            # "x y","y z" both once — top = lexicographically smallest
            (1, "x y z"),
            (2, "single"),  # <2 tokens → absent
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0]["n_bigrams"], rows[0]["distinct_bigrams"], rows[0]["dup_bigram_n"]) == (5, 2, 3)
    assert (rows[0]["top_bigram"], rows[0]["top_bigram_n"]) == ("a b", 3)
    assert (rows[1]["top_bigram"], rows[1]["top_bigram_n"]) == ("x y", 1)
    assert rows[1]["dup_bigram_n"] == 0


def test_llm_token_count_heuristic(spark):
    from news_information_retrieval_system_spark.ops.textstats import llm_token_count_col

    docs = spark.createDataFrame(
        [
            # pieces: "hello"(2) "world"(2) "!!"(1) → 5
            (0, "Hello world!!"),
            # "internationalization" len 20 → 5; "2024" → 1 → 6
            (1, "internationalization 2024"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", llm_token_count_col(F.col("text")).alias("n")).collect()
    }
    assert got == {0: 5, 1: 6, 2: 0}


def test_split_fractions_validate():
    with pytest.raises(Exception):
        # nonsensical fractions should fail fast, not mis-assign
        split_col("doc_id", train=0.9, val=0.2)


def test_pack_sequences_placement(spark):
    from news_information_retrieval_system_spark.ops.curation import pack_sequences

    # token counts (+1 sep): 3, 5, 2, 4 → starts 0, 3, 8, 10; seq_len=4
    docs = spark.createDataFrame(
        [(10, "a b"), (20, "c d e f"), (30, "g"), (40, "h i j")],
        "doc_id long, text string",
    )
    # num_ranges=3 forces the prefix-offset path across real partitions
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(docs, seq_len=4, num_ranges=3).collect()
    }
    expect = {
        10: (3, 0, 0, 0, 1),   # tokens 0-2   → example 0
        20: (5, 3, 0, 1, 2),   # tokens 3-7   → spans examples 0-1
        30: (2, 8, 2, 2, 1),   # tokens 8-9   → example 2
        40: (4, 10, 2, 3, 2),  # tokens 10-13 → spans examples 2-3
    }
    for did, (n, st, fe, le, sp) in expect.items():
        r = rows[did]
        assert (
            r["n_tokens"], r["start_token"], r["first_example"],
            r["last_example"], r["n_examples_spanned"],
        ) == (n, st, fe, le, sp)


def test_packing_stats_rollup(spark):
    from news_information_retrieval_system_spark.ops.curation import packing_stats

    docs = spark.createDataFrame(
        [(10, "a b"), (20, "c d e f"), (30, "g"), (40, "h i j")],
        "doc_id long, text string",
    )
    row = packing_stats(docs, seq_len=4).collect()[0]
    assert row["n_docs"] == 4
    assert row["total_tokens"] == 14
    assert row["n_examples"] == 4      # ceil(14/4)
    assert row["n_docs_spanning"] == 2  # docs 20 and 40
    assert row["last_fill"] == 2        # 14 % 4


def test_hash_stratified_sample_edges(spark):
    from news_information_retrieval_system_spark.ops.curation import (
        hash_stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(64)],
        "doc_id long, text string, lang string",
    )
    # rate 1.0 keeps EVERY row (the format(256,'02x')='100' trap)
    assert hash_stratified_sample(docs, {"en": 1.0}, default_rate=1.0).count() == 64
    # rate 0.0 drops the listed class entirely, default keeps the rest
    out = hash_stratified_sample(docs, {"en": 0.0}, default_rate=1.0)
    assert out.filter(F.col("lang") == "en").count() == 0
    assert out.count() == 32
    # deterministic: same call twice → identical surviving ids
    a = sorted(r["doc_id"] for r in hash_stratified_sample(
        docs, {"en": 0.5}, default_rate=0.25).collect())
    b = sorted(r["doc_id"] for r in hash_stratified_sample(
        docs, {"en": 0.5}, default_rate=0.25).collect())
    assert a == b


def test_split_col_full_train(spark):
    from news_information_retrieval_system_spark.ops.curation import assign_splits

    docs = spark.createDataFrame([(i, "t") for i in range(64)], "doc_id long, text string")
    got = assign_splits(docs, train=1.0, val=0.0).groupBy("split").count().collect()
    assert {r["split"]: r["count"] for r in got} == {"train": 64}


def test_perplexity_flags(spark):
    from news_information_retrieval_system_spark.ops.curation import perplexity_flags

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(1, 5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),   # in-distribution → low ppx
            (1, "zebra quartz flux joke"),   # all-unseen → ppx == vocab
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in perplexity_flags(docs, 6.5, lm_train=train, n=2).collect()
    }
    # vocab = {the,cat,sat,on,mat} = 5; unseen bigram p = 1/5 → ppx 5.0
    assert abs(rows[1]["perplexity"] - 5.0) < 1e-9
    assert rows[1]["flagged"] is False
    # exp((2·ln(13/5) + 3·ln(9/5)) / 5) ≈ 2.0852 under add-1 smoothing
    assert abs(rows[0]["perplexity"] - 2.0852246) < 1e-6
    assert rows[0]["flagged"] is False
    # tight threshold flags the OOD doc only
    rows2 = {
        r["doc_id"]: r["flagged"]
        for r in perplexity_flags(docs, 4.0, lm_train=train, n=2).collect()
    }
    assert rows2 == {0: False, 1: True}


@pytest.mark.parametrize("seed", [7, 23, 97])
def test_pack_sequences_randomized_vs_python(spark, seed):
    """Placement map equals a pure-Python reference on random corpora
    (random token counts incl. empty docs, random seq_len, forced
    multi-partition prefix-offset path)."""
    import random

    from news_information_retrieval_system_spark.ops.curation import pack_sequences

    rng = random.Random(seed)
    seq_len = rng.choice([3, 8, 17, 64])
    rows = [(i * 10, " ".join(["w"] * rng.randrange(0, 30))) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_token"], r["first_example"],
            r["last_example"], r["n_examples_spanned"],
        )
        for r in pack_sequences(docs, seq_len=seq_len, num_ranges=7).collect()
    }
    acc, want = 0, {}
    for did, text in rows:  # already in doc_id order
        n = len([t for t in text.split(" ") if t]) + 1
        first, last = acc // seq_len, (acc + n - 1) // seq_len
        want[did] = (n, acc, first, last, last - first + 1)
        acc += n
    assert got == want


def test_example_map_invariants(spark):
    """Every example's slices sum to exactly seq_len (except the final
    partial one), offsets are in-bounds, and the map is invariant to the
    partition count."""
    import random

    from news_information_retrieval_system_spark.ops.curation import example_map

    rng = random.Random(41)
    rows = [(i, " ".join(["w"] * rng.randrange(0, 40))) for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seq_len = 16
    em = example_map(docs, seq_len=seq_len, num_ranges=5).collect()
    total = sum(len([t for t in tx.split(" ") if t]) + 1 for _, tx in rows)
    n_examples = (total + seq_len - 1) // seq_len
    by_ex = {}
    for r in em:
        by_ex.setdefault(r["example_id"], 0)
        by_ex[r["example_id"]] += r["n_in_example"]
        assert 0 <= r["off_in_doc"]
        assert r["n_in_example"] > 0
    assert set(by_ex) == set(range(n_examples))
    last = total % seq_len or seq_len
    for e, tok in by_ex.items():
        assert tok == (last if e == n_examples - 1 else seq_len)
    # partition-count invariance: identical rows at other num_ranges
    em3 = example_map(docs, seq_len=seq_len, num_ranges=2).collect()
    key = lambda r: (r["example_id"], r["doc_id"], r["off_in_doc"], r["n_in_example"])
    assert sorted(map(key, em)) == sorted(map(key, em3))


def test_duplicate_spans_marks_cross_doc_only(spark):
    from news_information_retrieval_system_spark.ops.curation import duplicate_spans

    docs = spark.createDataFrame(
        [
            # docs 0 and 1 share the 6-token run "one two three four five six"
            # → with k=5, dup gram starts at pos 0 and 1 in doc 0
            (0, "one two three four five six unique0 tail0 tail1 tail2"),
            (1, "pre0 pre1 one two three four five six post0"),
            # doc 2: INTERNAL repetition only ("a b c d e" twice) — k-grams
            # repeat within the doc but in no other doc → must be absent
            (2, "a b c d e a b c d e"),
            # doc 3: no overlap with anything
            (3, "w x y z q r s t u v"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, k=5).collect()}
    assert set(out) == {0, 1}
    # doc 0: 10 tokens, grams at 0..5 (6 grams); dup starts {0, 1} →
    # union of [0,4] and [1,5] = 6 tokens
    assert out[0]["n_tokens"] == 10
    assert out[0]["n_grams"] == 6
    assert out[0]["n_dup_grams"] == 2
    assert out[0]["dup_tokens"] == 6
    # doc 1: 9 tokens, dup starts {2, 3} → union [2,6]∪[3,7] = 6 tokens
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["dup_tokens"] == 6


def test_duplicate_spans_disjoint_and_adjacent_intervals(spark):
    from news_information_retrieval_system_spark.ops.curation import duplicate_spans

    # shared spans "c0 c1 c2" (k=3) at positions far apart in doc 0:
    # starts {0, 10} → disjoint intervals → 3 + 3 = 6 covered tokens
    filler = " ".join(f"f{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (0, f"c0 c1 c2 {filler} c0 c1 c2"),
            (1, "c0 c1 c2 other tokens here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, k=3).collect()}
    assert out[0]["n_dup_grams"] == 2
    assert out[0]["dup_tokens"] == 6
    assert out[1]["n_dup_grams"] == 1
    assert out[1]["dup_tokens"] == 3


def test_shuffle_shards_deterministic_and_partitioning_invariant(spark):
    import hashlib

    from news_information_retrieval_system_spark.ops.curation import shuffle_shards

    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(docs, n_shards=8)
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    assert len(rows) == 500
    # python mirror: shard from first two md5 hex chars, pos = rank of
    # full hash within shard
    expect = {}
    for i in range(500):
        h = hashlib.md5(f"shuf:{i}".encode()).hexdigest()
        expect[i] = (int(h[:2], 16) % 8, h)
    for shard in range(8):
        members = sorted(
            (h, i) for i, (s, h) in expect.items() if s == shard
        )
        for pos, (_, i) in enumerate(members, 1):
            assert rows[i] == (shard, pos), (i, rows[i], (shard, pos))
    # partitioning invariance: same placement at a different parallelism
    out2 = shuffle_shards(docs.repartition(7), n_shards=8)
    rows2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in out2.collect()}
    assert rows == rows2
    # shards are balanced within md5-uniformity tolerance
    from collections import Counter

    sizes = Counter(s for s, _ in rows.values())
    assert all(30 < sizes[s] < 100 for s in range(8)), sizes


def test_duplicate_spans_hash_grams_identical(spark):
    """The 100 TB configuration (8-byte xxhash64 gram keys through the
    shuffles) must produce the same marking as exact strings on a real
    corpus slice."""
    from news_information_retrieval_system_spark.ops.curation import duplicate_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, duplicate_spans(docs, k=5).collect()))
    b = sorted(map(tuple, duplicate_spans(docs, k=5, hash_grams=True).collect()))
    assert a == b and len(a) > 0


def test_remove_duplicate_spans_cuts_and_rejoins(spark):
    from news_information_retrieval_system_spark.ops.curation import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [
            # 0/1 share the 6-run "a b c d e f": doc 0 dup starts {0,1}
            # → island [0,6) → keeps the tail
            (0, "a b c d e f q r s t u"),
            (1, "m n a b c d e f o p"),
            # internal-only repetition: untouched
            (2, "x y z w v x y z w v"),
            # too short for k=5 grams: untouched
            (3, "p q r"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=5).collect()}
    assert len(out) == 4  # removal keeps every input row
    assert out[0]["text"] == "q r s t u"
    assert (out[0]["n_tokens"], out[0]["n_kept"], out[0]["n_removed"]) == (11, 5, 6)
    assert out[1]["text"] == "m n o p"
    assert out[1]["n_removed"] == 6
    assert out[2]["text"] == "x y z w v x y z w v"
    assert out[2]["n_removed"] == 0
    assert out[3]["text"] == "p q r"
    assert out[3]["n_removed"] == 0


def test_remove_duplicate_spans_disjoint_islands(spark):
    from news_information_retrieval_system_spark.ops.curation import (
        remove_duplicate_spans,
    )

    filler = " ".join(f"f{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (0, f"c0 c1 c2 {filler} c0 c1 c2"),
            (1, "c0 c1 c2 other tokens here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=3).collect()}
    assert out[0]["text"] == filler  # both shared runs cut, middle kept
    assert out[0]["n_removed"] == 6
    assert out[1]["text"] == "other tokens here"


def test_remove_matches_marking_invariant(spark):
    """n_removed must equal duplicate_spans().dup_tokens doc-for-doc on a
    real corpus slice (docs absent from the marking output remove 0)."""
    from news_information_retrieval_system_spark.ops.curation import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    marked = {r["doc_id"]: r["dup_tokens"] for r in duplicate_spans(docs, k=5).collect()}
    removed = {
        r["doc_id"]: r["n_removed"] for r in remove_duplicate_spans(docs, k=5).collect()
    }
    assert len(removed) == docs.count()
    assert len(marked) > 0
    for did, n_rm in removed.items():
        assert n_rm == marked.get(did, 0), did


def test_remove_duplicate_spans_hash_grams_identical(spark):
    from news_information_retrieval_system_spark.ops.curation import (
        remove_duplicate_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, remove_duplicate_spans(docs, k=5).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(docs, k=5, hash_grams=True).collect()))
    assert a == b and len(a) > 0
