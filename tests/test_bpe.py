"""BPE induction parity vs an independent per-word Python mirror
(classic Sennrich-style merge semantics: pair counts weighted by word
frequency, argmax with f-desc/lhs/rhs ties, left-to-right
non-overlapping merge application)."""

from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.bpe import (
    bpe_token_counts,
    encode_col,
    train_bpe,
)


def _py_bpe(word_freqs, n_merges, min_pair_freq=2):
    words = {w: [c for c in w] for w in word_freqs}
    merges = []
    for r in range(1, n_merges + 1):
        pc = {}
        for w, f in word_freqs.items():
            s = words[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + f
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < min_pair_freq:
            break
        merges.append((r, a, b, f))
        for w, s in words.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = out
    return merges, words


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs_from_freqs(spark, freqs):
    rows = [(i, " ".join([w] * f)) for i, (w, f) in enumerate(freqs.items())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_matches_python_mirror(spark):
    docs = _docs_from_freqs(spark, SENNRICH)
    got, words = train_bpe(docs, n_merges=10)
    want, py_words = _py_bpe(SENNRICH, 10)
    assert got == want
    assert len(got) >= 6  # the classic corpus supports many merges
    # final symbol sequences agree word-for-word
    enc = {
        r["word"]: r["enc"]
        for r in words.select("word", "enc").collect()
    }
    for w, syms in py_words.items():
        assert enc[w] == "".join(f"<{s}>" for s in syms), w


def test_overlapping_pair_merges_left_to_right(spark):
    # "aaaa" x3: round 1 must merge (a,a) -> [aa, aa], never [aa, a, a]
    docs = _docs_from_freqs(spark, {"aaaa": 3})
    merges, words = train_bpe(docs, n_merges=2)
    want, py_words = _py_bpe({"aaaa": 3}, 2)
    assert merges == want
    assert merges[0][1:3] == ("a", "a")
    enc = words.select("enc").collect()[0]["enc"]
    assert enc == "".join(f"<{s}>" for s in py_words["aaaa"])


def test_encode_col_applies_trained_merges(spark):
    docs = _docs_from_freqs(spark, SENNRICH)
    merges, _ = train_bpe(docs, n_merges=8)
    _, py_words = _py_bpe(SENNRICH, 8)
    # encode a held-out word with the same rules, mirrored in python
    unseen = "lowest"
    s = [c for c in unseen]
    for _, a, b, _ in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    got = (
        spark.createDataFrame([(unseen,)], "word string")
        .select(encode_col("word", merges).alias("enc"))
        .collect()[0]["enc"]
    )
    assert got == "".join(f"<{x}>" for x in s)


def test_partitioning_invariance(spark):
    docs = _docs_from_freqs(spark, SENNRICH)
    a, _ = train_bpe(docs, n_merges=6)
    b, _ = train_bpe(docs.repartition(7), n_merges=6)
    assert a == b


def test_token_counts_shrink_and_match_mirror(spark):
    docs = _docs_from_freqs(spark, SENNRICH)
    merges, words = train_bpe(docs, n_merges=8)
    _, py_words = _py_bpe(SENNRICH, 8)
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, words).collect()
    }
    for i, (w, f) in enumerate(SENNRICH.items()):
        assert out[i] == (f, f * len(py_words[w]))
    # merged vocab must compress vs characters
    total_chars = sum(len(w) * f for w, f in SENNRICH.items())
    total_bpe = sum(v[1] for v in out.values())
    assert total_bpe < total_chars
