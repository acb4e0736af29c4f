"""Round-2 operator tests: snippet module goldens (Q26), field-boost
rerank (Q22), BIM relevance feedback (Q17), LM variants (Q16), boolean
field:"phrase" (Q11), build-time stopword filter (T5), Rocchio drift
guard (Q24). Hand-computed expectations in the style of the reference's
unit tests (tests/test_metrics.py golden values)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index


# ------------------------------------------------------------- Q26 snippet
def test_snippet_best_sentence_and_highlight(spark):
    """Best sentence = most unique query-term hits, first wins ties;
    highlight wraps query terms in <mark> (search_service.py:627-703)."""
    from news_information_retrieval_system_spark.query.snippet import with_snippets

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma. the fast scan wins here. fast alone"),
            (2, "no hits anywhere. still no hits"),
        ],
        "doc_id long, text string",
    ).withColumn("query_text", F.lit("fast scan"))
    rows = {r["doc_id"]: r["snippet"] for r in with_snippets(df).collect()}
    assert rows[1] == "the <mark>fast</mark> <mark>scan</mark> wins here"
    # zero hits everywhere → first sentence, unhighlighted
    assert rows[2] == "no hits anywhere"


def test_snippet_truncates_to_180_chars(spark):
    from news_information_retrieval_system_spark.query.snippet import with_snippets

    long_sent = "fast " + "word " * 60  # one sentence, > 180 chars
    df = spark.createDataFrame(
        [(1, long_sent)], "doc_id long, text string"
    ).withColumn("query_text", F.lit("fast"))
    snip = with_snippets(df).collect()[0]["snippet"]
    # trim happens BEFORE highlighting (reference order), so the <mark>
    # wrapper may push the final string past 180 raw chars
    assert len(snip.replace("<mark>", "").replace("</mark>", "")) <= 180


def test_kwic_lines_golden(spark):
    from news_information_retrieval_system_spark.query.snippet import kwic_lines

    df = spark.createDataFrame(
        [(1, "a b fast c d and scan e")], "doc_id long, text string"
    ).withColumn("query_text", F.lit("fast scan"))
    out = kwic_lines(df, window=1).collect()[0]["kwic"]
    assert out == ["b [fast] c", "and [scan] e"]


# ----------------------------------------------------------- Q22 fieldboost
def test_field_boost_caps_and_candidate_scope(spark):
    """boost = Σ_field w·min(unique hits, 3), total capped at 1.5
    (search_service.py:434-481); docs outside the candidate set never
    contribute rows."""
    from news_information_retrieval_system_spark.query.fieldboost import (
        field_boost_rerank,
    )

    scored = spark.createDataFrame(
        [("q1", 1, 1.0), ("q1", 2, 0.5)],
        "query_id string, doc_id long, score double",
    )
    docs = spark.createDataFrame(
        [
            # doc 1: 4 unique title hits (capped at 3), 1 tag hit, 4 content
            # hits (capped 3) → 0.45*3 + 0.25*1 + 0.06*3 = 1.78 → capped 1.5
            (1, "t1 t2 t3 t4", ["t1"], "t1 t2 t3 t4 zzz"),
            # doc 2: one content hit → 0.06
            (2, "none here", ["x"], "t1 only"),
            # doc 3 is NOT a candidate; huge hits must not surface
            (3, "t1 t2 t3 t4", ["t1", "t2"], "t1 t2 t3 t4"),
        ],
        "doc_id long, title string, tags array<string>, content string",
    )
    q = spark.createDataFrame(
        [("q1", t) for t in ["t1", "t2", "t3", "t4"]], "query_id string, term string"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in field_boost_rerank(
            scored, docs, q, {"title": 0.45, "tags": 0.25, "content": 0.06}
        ).collect()
    }
    assert out[1] == pytest.approx(1.0 + 1.5)
    assert out[2] == pytest.approx(0.5 + 0.06)
    assert set(out) == {1, 2}


# ------------------------------------------------------- Q17 BIM feedback
def test_bim_feedback_weight_hand_computed(spark):
    """N=4 docs, term 'x' in docs {0,1}, relevant={0}: pi=1.5/2, qi=1.5/4,
    w = ln(pi(1-qi)/((1-pi)qi)) = ln(5) (bim.py:244-256)."""
    from news_information_retrieval_system_spark.query.bim import score_bim_feedback

    docs = spark.createDataFrame(
        [(0, "x a"), (1, "x b"), (2, "c d"), (3, "e f")],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    q = spark.createDataFrame([("q1", "x")], "query_id string, term string")
    rel = spark.createDataFrame([(0,)], "doc_id long")
    rows = {r["doc_id"]: r["score"] for r in score_bim_feedback(idx, q, rel).collect()}
    expect = math.log((0.75 * (1 - 0.375)) / ((1 - 0.75) * 0.375))
    assert rows[0] == pytest.approx(expect)
    assert rows[1] == pytest.approx(expect)
    assert set(rows) == {0, 1}


# ------------------------------------------------------------ Q16 variants
def test_lm_absdisc_hand_computed(spark):
    """p(t|D) = max(tf-δ,0)/dl + δ·|uniq|/dl · p_c
    (language_model_retrieval.py:270-302)."""
    from news_information_retrieval_system_spark.query.lm import score_lm_absdisc

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "y z w")], "doc_id long, text string"
    )
    idx = build_index(docs)
    q = spark.createDataFrame([("q1", "x", 1)], "query_id string, term string, qtf int")
    rows = {r["doc_id"]: r["score"] for r in score_lm_absdisc(idx, q, delta=0.7).collect()}
    # doc0: tf=2, dl=3, uniq=2, p_c = cf/total = 2/6
    expect = math.log((2 - 0.7) / 3 + (0.7 * 2 / 3) * (2 / 6))
    assert rows[0] == pytest.approx(expect)
    assert set(rows) == {0}  # only docs matching ≥1 query term are candidates


def test_lm_kl_rank_matches_dirichlet(spark, mini_docs=None):
    """-KL(Q||D) differs from query likelihood only by the query-entropy
    constant → identical ranking per query (language_model_retrieval.py:415-455)."""
    from news_information_retrieval_system_spark.query.lm import (
        score_lm,
        score_lm_kl,
    )
    from news_information_retrieval_system_spark.query.bm25 import topk

    docs = spark.createDataFrame(
        [
            (0, "x y z x"),
            (1, "x q r"),
            (2, "y y x w"),
            (3, "z z q x y"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    q = spark.createDataFrame(
        [("q1", "x", 1), ("q1", "y", 2)], "query_id string, term string, qtf int"
    )
    r1 = [(r["rank"], r["doc_id"]) for r in topk(score_lm(idx, q), k=4).collect()]
    r2 = [(r["rank"], r["doc_id"]) for r in topk(score_lm_kl(idx, q), k=4).collect()]
    assert sorted(r1) == sorted(r2)


# -------------------------------------------------------- Q11 field phrase
def test_field_phrase_parses_and_ands_tokens(spark):
    """text:"fast scan" = AND of the phrase tokens within the field
    (reference boolean.py:603-628 — membership, not positional)."""
    from news_information_retrieval_system_spark.query.boolean import BooleanEngine

    docs = spark.createDataFrame(
        [
            (0, "fast and later a scan"),  # both tokens, not adjacent → match
            (1, "fast only"),
            (2, "scan only"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    eng = BooleanEngine(idx)
    got = {r["doc_id"] for r in eng.query('text:"fast scan"').collect()}
    assert got == {0}


# ------------------------------------------------------- T5 stopword build
def test_stopword_build_filters_and_shrinks_dl(spark):
    from news_information_retrieval_system_spark.index.build import build_index as bi

    docs = spark.createDataFrame(
        [(0, "the fast scan of the index")], "doc_id long, text string"
    )
    idx = bi(docs, stopwords=("the", "of"))
    terms = {r["term"] for r in idx.postings.collect()}
    assert terms == {"fast", "scan", "index"}
    dl = idx.postings.select("dl").first()["dl"]
    assert dl == 3  # post-filter length, reference doc_lengths semantics


# --------------------------------------------------------- Q24 drift guard
def test_rocchio_drift_guard_shrinks_expansion(spark):
    """With a tiny max_drift the expansion cap collapses to
    max(1, int(max_terms·max_drift/drift)) = 1; originals always survive
    (reference rocchio.py:277-307)."""
    from news_information_retrieval_system_spark.query.rocchio import rocchio_expand

    docs = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee"),
            (1, "aa bb cc dd ff"),
            (2, "qq zz"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    q = spark.createDataFrame([("q1", "qq", 1)], "query_id string, term string, qtf int")
    fb = spark.createDataFrame([("q1", 0), ("q1", 1)], "query_id string, doc_id long")
    free = rocchio_expand(idx, q, fb, max_terms=8, min_weight=0.0)
    guarded = rocchio_expand(
        idx, q, fb, max_terms=8, min_weight=0.0, max_drift=1e-4
    )
    n_free = free.filter(F.col("term") != "qq").count()
    n_guarded = guarded.filter(F.col("term") != "qq").count()
    assert n_free > 1
    assert n_guarded == 1
    assert guarded.filter(F.col("term") == "qq").count() == 1


# ------------------------------------------------ Q24 γ negative feedback
def test_rocchio_gamma_subtracts_nonrelevant_and_clamps(spark):
    """γ·centroid(D_nr) is subtracted from the expanded vector and the
    result is clamped at 0 per term (reference rocchio.py:100,264-275):
    a term appearing only in non-relevant docs never goes negative, and a
    shared term's weight strictly drops vs the γ=0 expansion."""
    from news_information_retrieval_system_spark.query.rocchio import rocchio_expand

    docs = spark.createDataFrame(
        [
            (0, "aa bb shared"),
            (1, "aa bb shared"),
            (2, "bad shared noise"),
            (3, "bad noise zz"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    q = spark.createDataFrame([("q1", "aa", 1)], "query_id string, term string, qtf int")
    fb = spark.createDataFrame([("q1", 0), ("q1", 1)], "query_id string, doc_id long")
    neg = spark.createDataFrame([("q1", 2), ("q1", 3)], "query_id string, doc_id long")
    base = {
        r["term"]: r["weight"]
        for r in rocchio_expand(idx, q, fb, max_terms=20, min_weight=-1e9).collect()
    }
    got = {
        r["term"]: r["weight"]
        for r in rocchio_expand(
            idx, q, fb, neg_feedback=neg, gamma=0.5, max_terms=20, min_weight=-1e9
        ).collect()
    }
    # pure-negative term clamped at 0, never negative
    assert got.get("bad", 0.0) == 0.0
    assert all(w >= 0.0 for w in got.values())
    # the term shared across both centroids strictly loses weight
    assert got["shared"] < base["shared"]
    # terms only in relevant docs are unaffected by γ
    assert abs(got["bb"] - base["bb"]) < 1e-12


# ------------------------------------------------- JVM dedup/fingerprints
def test_simhash_jvm_matches_vote_semantics(spark):
    """JVM simhash: identical text → identical fingerprint; permuted text
    (same bag of words) → identical; disjoint text → different."""
    from news_information_retrieval_system_spark.ops.dedup import simhash64_df

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha"),
            (1, "alpha beta gamma alpha"),
            (2, "gamma alpha alpha beta"),  # same multiset, order ignored
            (3, "zz qq ww ee rr tt"),
        ],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["sim"] for r in simhash64_df(docs).collect()}
    assert h[0] == h[1] == h[2]
    assert h[0] != h[3]


def test_simhash_jvm_candidates_find_near_dup(spark):
    from news_information_retrieval_system_spark.ops.dedup import simhash_candidates

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(0, base), (1, base + " extra"), (2, "completely different words here entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_candidates(docs, hamming=15, bands=16).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_fingerprint_col_matches_python_reference(spark):
    from news_information_retrieval_system_spark.ops.textstats import (
        FP_BASE,
        FP_K,
        FP_MOD,
        fingerprint_col,
    )

    texts = ["hello world fingerprints", "tiny", "", "exactly8"]

    def py_fp(t):
        if not t:
            return 0
        if len(t) < FP_K:
            return sum(ord(c) % 256 for c in t)
        return min(
            sum((ord(t[j + l]) % 256) * FP_BASE ** (FP_K - 1 - l) for l in range(FP_K))
            % FP_MOD
            for j in range(len(t) - FP_K + 1)
        )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", fingerprint_col(F.col("text")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_fp(t), (t, got[i], py_fp(t))


def test_rademacher_bucket_col_matches_numpy(spark):
    import numpy as np

    from news_information_retrieval_system_spark.ops.similarity import (
        bucket_col,
        rademacher_signs,
    )

    signs = rademacher_signs(8, 5, seed=7)
    vecs = [[float(i + j) - 3.5 for j in range(8)] for i in range(4)]
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["b"]
        for r in df.select("vec_id", bucket_col("embedding", signs).alias("b")).collect()
    }
    for i, v in enumerate(vecs):
        dots = np.array(v) @ signs
        expect = int(sum(1 << p for p in range(5) if round(dots[p], 6) > 0))
        assert got[i] == expect


# -------------------------------------------------------- A3 metric tail
def test_extended_eval_metrics_hand_computed(spark):
    """ERR/RBP/bpref/R-prec/success/F1 against a hand-worked example
    (formulas of reference metrics.py:146,521,635,718,780,810)."""
    from news_information_retrieval_system_spark.eval.metrics import (
        per_query_metrics,
    )

    ranked = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([1, 2, 3, 4, 5], start=1)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 3), ("q1", 2, 1), ("q1", 4, 2)],
        "query_id string, doc_id long, rel int",
    )
    m = per_query_metrics(ranked, qrels, k=5).collect()[0]
    # ERR cascade (max_grade=3): R = [.875, .125, 0, .375, 0]
    err = 0.875 + (1 - 0.875) * 0.125 / 2 + (1 - 0.875) * (1 - 0.125) * 0.375 / 4
    rbp = 0.2 * (1.0 + 0.8 + 0.8 ** 3)
    bpref = (1.0 + 1.0 + (1 - 1 / 3)) / 3
    assert m["err"] == pytest.approx(err)
    assert m["rbp"] == pytest.approx(rbp)
    assert m["bpref"] == pytest.approx(bpref)
    assert m["r_prec"] == pytest.approx(2 / 3)  # hits within rank ≤ R=3
    assert m["success"] == 1.0
    p, r = 3 / 5, 3 / 3
    assert m["f1"] == pytest.approx(2 * p * r / (p + r))


def test_index_from_blocks_reproduces_flat_rankings(spark):
    """Blocked → hydrated index must rank identically to the flat build
    (append ≡ rebuild foundation; reference finalize semantics)."""
    from news_information_retrieval_system_spark.index.segments import (
        build_blocked_postings,
        index_from_blocks,
    )
    from news_information_retrieval_system_spark.query.bm25 import (
        bm25_topk,
        query_terms_df,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flat = build_index(docs)
    blocks = build_blocked_postings(flat.postings, term_dict=flat.term_stats)
    hydrated = index_from_blocks(blocks, docs)
    q = query_terms_df(spark, {"q1": "fast table scan", "q2": "slow value"})
    a = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(flat, q, k=10).collect()]
    b = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in bm25_topk(hydrated, q, k=10).collect()]
    assert sorted(a) == sorted(b)
