"""HAC (ops/cluster.py hierarchical_doc_clusters) — hand-computed goldens
for all three linkages over a 4-point geometry."""

import math

import pytest

from news_information_retrieval_system_spark.ops.cluster import (
    hierarchical_doc_clusters,
    pairwise_cosine,
)

# four unit-ish 2-d vectors: two tight pairs at right angles
VECS = [
    (0, [1.0, 0.0]),
    (1, [0.98, 0.2]),   # close to 0
    (2, [0.0, 1.0]),
    (3, [0.2, 0.98]),   # close to 2
]


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_pairwise_cosine_values(spark):
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in pairwise_cosine(_df(spark)).collect()
    }
    assert len(got) == 6
    n = math.sqrt(0.98**2 + 0.2**2)
    assert abs(got[(0, 1)] - 0.98 / n) < 1e-12
    assert abs(got[(0, 2)] - 0.0) < 1e-12


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
def test_hac_two_clusters(spark, linkage):
    out = {
        r["doc_id"]: r["cluster"]
        for r in hierarchical_doc_clusters(_df(spark), k=2, linkage=linkage).collect()
    }
    # the two tight pairs merge first under every linkage
    assert out[0] == out[1] and out[2] == out[3] and out[0] != out[2]


def test_hac_k_geq_n_is_identity(spark):
    out = hierarchical_doc_clusters(_df(spark), k=10).collect()
    assert len({r["cluster"] for r in out}) == 4


def test_hac_max_docs_guard(spark):
    # the guard must also STEER: name the distributed alternatives
    with pytest.raises(ValueError, match="kmeans_assign"):
        hierarchical_doc_clusters(_df(spark), k=2, max_docs=2)
    with pytest.raises(ValueError, match="semantic_dedup"):
        hierarchical_doc_clusters(_df(spark), k=2, max_docs=2)


def test_hac_rejects_bad_args(spark):
    with pytest.raises(ValueError, match="k must be positive"):
        hierarchical_doc_clusters(_df(spark), k=0)
    with pytest.raises(ValueError, match="unknown linkage"):
        hierarchical_doc_clusters(_df(spark), k=10, linkage="ward")


def test_zero_norm_embedding_is_similarity_zero(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.1])],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"] for r in pairwise_cosine(vecs).collect()
    }
    assert got[(0, 1)] == 0.0 and got[(1, 2)] == 0.0
    # and HAC still runs: the zero vector ends up alone
    out = {
        r["doc_id"]: r["cluster"]
        for r in hierarchical_doc_clusters(vecs, k=2).collect()
    }
    assert out[0] == out[2] and out[1] != out[0]
