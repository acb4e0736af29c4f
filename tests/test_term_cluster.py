"""Term clustering (ops/term_cluster.py): pair generation, reference
greedy semantics, and CC labeling consistency."""

from news_information_retrieval_system_spark.ops.term_cluster import (
    cooccurrence_pairs,
    edit_distance_clusters,
    edit_distance_pairs,
    greedy_absorb,
    term_vocab,
)


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_edit_distance_pairs_blocking_is_exact(spark):
    words = ["cat", "cats", "dog", "dogs", "catalog"]
    rows = {
        (r["term_a"], r["term_b"]): r["dist"]
        for r in edit_distance_pairs(_terms(spark, words), max_distance=1).collect()
    }
    # catalog differs from cat by 4 — excluded by the length block AND dist
    assert rows == {("cat", "cats"): 1, ("dog", "dogs"): 1}


def test_greedy_absorb_reference_example(spark):
    # reference docstring (term_cluster.py:354-359): cat/cats/dog/dogs at
    # max_distance=1 -> 2 clusters
    words = ["cat", "cats", "dog", "dogs"]
    pairs = edit_distance_pairs(_terms(spark, words), max_distance=1).collect()
    edges = {}
    for r in pairs:
        edges.setdefault(r["term_a"], set()).add(r["term_b"])
        edges.setdefault(r["term_b"], set()).add(r["term_a"])
    clusters = greedy_absorb(words, edges)
    assert len(clusters) == 2
    assert clusters[0] == ("cat", ["cat", "cats"])
    assert clusters[1] == ("dog", ["dog", "dogs"])


def test_cc_clusters_merge_transitive_chains(spark):
    # greedy with centers in order would split a-ab-abc differently;
    # CC merges the whole chain and labels by the min term
    words = ["ab", "abcd", "abc", "zz"]
    out = {
        r["term"]: r["cluster"]
        for r in edit_distance_clusters(
            _terms(spark, words), max_distance=1
        ).collect()
    }
    assert out == {"ab": "ab", "abc": "ab", "abcd": "ab", "zz": "zz"}


def test_cooccurrence_pairs_counts_docs_not_tokens(spark):
    docs = spark.createDataFrame(
        [
            (0, "x y x y"),   # x,y co-occur in this doc ONCE (set semantics)
            (1, "x y"),
            (2, "x z"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["term_a"], r["term_b"]): r["n_co"]
        for r in cooccurrence_pairs(docs, min_cooccurrence=1).collect()
    }
    assert rows == {("x", "y"): 2, ("x", "z"): 1}
    assert term_vocab(docs).count() == 3


def test_star_clustering_reference_example(spark):
    from news_information_retrieval_system_spark.ops.term_cluster import (
        star_absorb,
        star_similarity_pairs,
    )

    # reference docstring (term_cluster.py:221-225): these five at
    # threshold 0.7 -> 2 clusters
    words = ["color", "colour", "colored", "paint", "painted"]
    pairs = star_similarity_pairs(_terms(spark, words), threshold=0.7).collect()
    got = {(r["term_a"], r["term_b"]): round(r["sim"], 4) for r in pairs}
    # color~colour 1-1/6, color~colored 1-2/7, paint~painted 1-2/7
    assert got == {
        ("color", "colour"): round(1 - 1 / 6, 4),
        ("color", "colored"): round(1 - 2 / 7, 4),
        ("paint", "painted"): round(1 - 2 / 7, 4),
    }
    edges = {}
    for (ta, tb) in got:
        edges.setdefault(ta, set()).add(tb)
        edges.setdefault(tb, set()).add(ta)
    clusters = star_absorb(words, edges)
    assert len(clusters) == 2
    # 'color' has the highest potential (self + 2 neighbors)
    assert clusters[0] == ("color", ["color", "colour", "colored"])
    assert clusters[1] == ("paint", ["paint", "painted"])


def test_absorb_driver_vocab_guard():
    import pytest

    from news_information_retrieval_system_spark.ops.term_cluster import (
        star_absorb,
    )

    words = ["a", "b", "c"]
    # guards must steer to the distributed CC clusterings
    with pytest.raises(ValueError, match="edit_distance_clusters"):
        greedy_absorb(words, {}, max_terms=2)
    with pytest.raises(ValueError, match="cooccurrence_clusters"):
        star_absorb(words, {}, max_terms=2)
    # under the cap both still run
    assert greedy_absorb(words, {}, max_terms=3) == [
        ("a", ["a"]), ("b", ["b"]), ("c", ["c"]),
    ]
