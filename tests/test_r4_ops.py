"""Tests for round-4 ops: RAKE / TextRank keywords, k-means clustering,
content-based related docs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.index.build import build_index
from news_information_retrieval_system_spark.ops.cluster import kmeans_assign
from news_information_retrieval_system_spark.ops.keywords import (
    rake_keywords,
    textrank_keywords,
)
from news_information_retrieval_system_spark.ops.recommend import related_docs

STOP = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with", "over")


def test_rake_hand_computed(spark):
    # "the quick brown fox jumps over the lazy dog" with stopwords
    # {the, over}: candidates "quick brown fox jumps" (len 4) and
    # "lazy dog" (len 2); all words unique -> score(w) = deg/freq = len,
    # phrase scores 16 and 4 (classic RAKE worked example).
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, stopwords=("the", "over"), top_k=10).collect()
    got = {r["phrase"]: (r["n_words"], r["score"]) for r in rows}
    assert got == {
        "quick brown fox jumps": (4, pytest.approx(16.0)),
        "lazy dog": (2, pytest.approx(4.0)),
    }


def test_rake_repeated_words_degree(spark):
    # "fast index for fast scan" stop={for}: phrases "fast index",
    # "fast scan". freq(fast)=2, deg(fast)=4; score(fast)=2;
    # index/scan: freq 1, deg 2, score 2. Both phrases score 4.
    df = spark.createDataFrame(
        [(1, "fast index for fast scan")], "doc_id long, text string"
    )
    rows = rake_keywords(df, stopwords=("for",), top_k=10).collect()
    assert {r["phrase"]: r["score"] for r in rows} == {
        "fast index": pytest.approx(4.0),
        "fast scan": pytest.approx(4.0),
    }


def test_rake_max_phrase_len_discards(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon of zeta")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, stopwords=("of",), max_phrase_len=4, top_k=10).collect()
    # the 5-word run is discarded (rake-nltk max_length semantics), zeta kept
    assert [r["phrase"] for r in rows] == ["zeta"]


def _pagerank_ref(toks, window=5, d=0.85, iters=60):
    """Independent dict-based weighted PageRank mirror (the published
    algorithm / networkx semantics: stochastic by out-weight, dangling
    mass spread uniformly)."""
    nodes = sorted(set(toks))
    w: dict = {}
    for i in range(len(toks)):
        for j in range(i + 1, min(i + window, len(toks))):
            if toks[i] != toks[j]:
                e = (toks[i], toks[j])
                w[e] = w.get(e, 0) + 1
                w[(toks[j], toks[i])] = w[e]
    out = {u: 0.0 for u in nodes}
    for (u, _v), wt in w.items():
        out[u] += wt
    n = len(nodes)
    pr = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        dang = sum(pr[u] for u in nodes if out[u] == 0.0)
        new = {v: (1 - d) / n + d * dang / n for v in nodes}
        for (u, v), wt in w.items():
            new[v] += d * pr[u] * wt / out[u]
        pr = new
    return pr


def test_textrank_matches_reference_pagerank(spark, mini_docs):
    got = textrank_keywords(
        mini_docs, stopwords=STOP, window=5, n_iters=60, top_k=100
    ).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = r["pr"]
    for doc_id, text in [(r["doc_id"], r["text"]) for r in mini_docs.collect()]:
        toks = [t for t in text.lower().split() if t not in STOP]
        want = _pagerank_ref(toks)
        have = by_doc.get(doc_id, {})
        assert set(have) == set(want)
        # probabilities sum to 1 and match the mirror
        assert sum(have.values()) == pytest.approx(1.0, abs=1e-6)
        for term, pr in want.items():
            assert have[term] == pytest.approx(pr, abs=5e-6)


def test_kmeans_separated_clusters(spark):
    # two tight blobs far apart -> k=2 must split them exactly, whatever
    # ids seeded the centroids
    rng = np.random.default_rng(7)
    rows = []
    for i in range(10):
        rows.append((i, (np.array([10.0, 0.0, 0.0]) + rng.normal(0, 0.05, 3)).tolist()))
    for i in range(10, 20):
        rows.append((i, (np.array([0.0, 10.0, 0.0]) + rng.normal(0, 0.05, 3)).tolist()))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(vecs, k=2, n_iters=4).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(out) == 20
    assert sorted(map(sorted, by_cluster.values())) == [
        list(range(10)),
        list(range(10, 20)),
    ]


def test_kmeans_assigns_every_vector_once(spark):
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = vecs.count()
    out = kmeans_assign(vecs, k=8, n_iters=2)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    assert out.agg(F.countDistinct("cluster")).collect()[0][0] <= 8


def test_related_docs_matches_bruteforce(spark, mini_docs):
    idx = build_index(mini_docs)
    seeds = spark.createDataFrame([(0,), (5,)], "doc_id long")
    got = related_docs(idx, seeds, topn=3).collect()

    # brute-force ltc cosine from the postings
    posts = idx.postings.collect()
    stats = {r["term"]: r for r in idx.term_stats.collect()}
    vecs: dict = {}
    for r in posts:
        w = (1.0 + np.log10(r["tf"])) * stats[r["term"]]["idf"]
        vecs.setdefault(r["doc_id"], {})[r["term"]] = w
    for d, v in vecs.items():
        norm = np.sqrt(sum(x * x for x in v.values()))
        vecs[d] = {t: x / norm for t, x in v.items()}
    for seed in (0, 5):
        sims = []
        for other, v in vecs.items():
            if other == seed:
                continue
            s = sum(w * v.get(t, 0.0) for t, w in vecs[seed].items())
            if s:
                sims.append((other, round(s, 9)))
        sims.sort(key=lambda x: (-x[1], x[0]))
        want = sims[:3]
        have = [
            (r["doc_id"], r["cosine"])
            for r in sorted(
                (x for x in got if x["seed_id"] == seed), key=lambda r: r["rec_rank"]
            )
        ]
        assert have == [(d, pytest.approx(c)) for d, c in want]


def test_related_docs_excludes_self(spark, mini_docs):
    idx = build_index(mini_docs)
    seeds = mini_docs.select("doc_id")
    out = related_docs(idx, seeds, topn=5)
    assert out.filter(F.col("seed_id") == F.col("doc_id")).count() == 0


def test_sentences_positions_and_filter(spark):
    # position counts every non-empty raw sentence, including ones the
    # length filter later drops (reference static.py:172-188)
    from news_information_retrieval_system_spark.ops.summarize import sentences_df

    df = spark.createDataFrame(
        [(1, "one two three. alpha beta gamma delta eps!  short. six seven eight nine ten eleven?")],
        "doc_id long, text string",
    )
    rows = sorted(sentences_df(df).collect(), key=lambda r: r["position"])
    # raw sentences: pos0 "one two three"(3, dropped) pos1 alpha..(5 kept)
    # pos2 "short"(1, dropped) pos3 six..eleven (6 kept)
    assert [(r["position"], r["n_tokens"]) for r in rows] == [(1, 5), (3, 6)]


def test_key_sentences_hand_computed(spark):
    from news_information_retrieval_system_spark.ops.summarize import key_sentences

    # two kept sentences; shared vocab so idf is partly zero
    text = "cat dog bird fish wolf. cat cat cat cat cat cat."
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = {r["position"]: r for r in key_sentences(df, k=2).collect()}
    import math

    # tf: cat=7, dog/bird/fish/wolf=1 each; n_sent=2; df(cat)=2 others 1
    idf_rare = math.log(2 / 1)
    s0 = (7 * 0.0 + 4 * (1 * idf_rare)) / 5 * (1 + 0.5 / 1)
    s1 = (6 * (7 * 0.0)) / 6 * (1 + 0.5 / 2)
    assert rows[0]["score"] == pytest.approx(round(s0, 9))
    assert rows[1]["score"] == pytest.approx(round(s1, 9))


def test_lead_k(spark):
    from news_information_retrieval_system_spark.ops.summarize import lead_k

    text = "a b c d e f. g h i j k. l m n o p. q r s t u."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(lead_k(df, k=2).collect(), key=lambda r: r["position"])
    assert [r["sentence"] for r in rows] == ["a b c d e f", "g h i j k"]


def test_model_compare_payloads_hand_computed(spark):
    """Q27 comparison payloads on a 2-model fixture: overlap counts,
    unique-doc counts (zero-filled), rank spans for shared docs only."""
    from news_information_retrieval_system_spark.query.compare import (
        model_overlap,
        rank_changes,
        unique_docs,
    )

    ra = spark.createDataFrame(
        [("q1", 1, 10), ("q1", 2, 11), ("q1", 3, 12), ("q2", 1, 20)],
        "query_id string, rank long, doc_id long",
    )
    rb = spark.createDataFrame(
        [("q1", 1, 11), ("q1", 2, 13), ("q1", 3, 10), ("q2", 1, 21)],
        "query_id string, rank long, doc_id long",
    )
    ranked = {"ma": ra, "mb": rb}
    ov = {(r["query_id"], r["model_a"], r["model_b"]): r["overlap"]
          for r in model_overlap(ranked).collect()}
    # q1 shares {10, 11}; q2 shares nothing but the pair row must exist
    assert ov == {("q1", "ma", "mb"): 2, ("q2", "ma", "mb"): 0}
    uq = {(r["query_id"], r["model"]): r["unique_count"]
          for r in unique_docs(ranked).collect()}
    assert uq == {("q1", "ma"): 1, ("q1", "mb"): 1,
                  ("q2", "ma"): 1, ("q2", "mb"): 1}
    rc = {(r["query_id"], r["doc_id"]): (r["n_models"], r["rank_span"])
          for r in rank_changes(ranked).collect()}
    # doc 10: ranks 1 vs 3 -> span 2; doc 11: ranks 2 vs 1 -> span 1
    assert rc == {("q1", 10): (2, 2), ("q1", 11): (2, 1)}


def test_cluster_label_terms_sparse_centroid_mean(spark):
    from news_information_retrieval_system_spark.ops.cluster import (
        cluster_label_terms,
    )

    asn = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, cluster int"
    )
    # doc 2 lacks 'beta': its centroid weight must average over BOTH
    # cluster members (missing term contributes 0), the reference's
    # sparse-mean centroid (cluster_topic_service.py:130-154)
    w = spark.createDataFrame(
        [
            (1, "alpha", 2.0),
            (1, "beta", 4.0),
            (2, "alpha", 6.0),
            (3, "gamma", 1.0),
        ],
        "doc_id long, term string, w double",
    )
    rows = {
        (r["cluster"], r["term"]): (r["n_docs"], r["kw_rank"], r["cw"])
        for r in cluster_label_terms(asn, w, top_terms=2).collect()
    }
    assert rows[(0, "alpha")] == (2, 1, 4.0)  # (2+6)/2
    assert rows[(0, "beta")] == (2, 2, 2.0)  # 4/2 — divided by SIZE
    assert rows[(1, "gamma")] == (1, 1, 1.0)


def test_cluster_label_top_terms_tiebreak(spark):
    from news_information_retrieval_system_spark.ops.cluster import (
        cluster_label_terms,
    )

    asn = spark.createDataFrame([(1, 0)], "vec_id long, cluster int")
    w = spark.createDataFrame(
        [(1, "zed", 3.0), (1, "ant", 3.0), (1, "mid", 9.0)],
        "doc_id long, term string, w double",
    )
    got = [
        (r["kw_rank"], r["term"])
        for r in cluster_label_terms(asn, w, top_terms=2)
        .orderBy("kw_rank")
        .collect()
    ]
    # weight desc, then term asc on the tie; top_terms truncates
    assert got == [(1, "mid"), (2, "ant")]
