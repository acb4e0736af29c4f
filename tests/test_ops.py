import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.eval.metrics import per_query_metrics, run_metrics
from news_information_retrieval_system_spark.ops.multimodal import (
    extract_features,
    frame_sample,
    synth_media,
)
from news_information_retrieval_system_spark.ops.similarity import cosine_topk, lsh_cosine_topk
from news_information_retrieval_system_spark.ops.textstats import text_profile


def test_cosine_topk_exact(spark):
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = cosine_topk(vecs, [0, 1], k=5).collect()
    rows = [r for r in vecs.collect()]
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    for qid in (0, 1):
        q = emb[qid]
        sims = []
        for vid, v in emb.items():
            if vid == qid:
                continue
            sims.append((vid, float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))))
        sims.sort(key=lambda x: (-x[1], x[0]))
        want = sims[:5]
        have = sorted(
            [(r["rank"], r["vec_id"], r["cosine"]) for r in got if r["query_id"] == qid]
        )
        assert [v for _, v, _ in have] == [v for v, _ in want]
        for (_, _, cg), (_, cw) in zip(have, want):
            assert cg == pytest.approx(cw, rel=1e-9)


def test_lsh_finds_planted_neighbors(spark):
    # plant a near-duplicate (cos ≈ 0.99) for each query vector: LSH must
    # recover it. (Uniform random vectors are near-orthogonal — recall on
    # them measures chance, not the operator.)
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").collect()
    rng = np.random.default_rng(0)
    rows, qids = [], []
    for r in base[:100]:
        v = np.array(r["embedding"], dtype=np.float64)
        rows.append((int(r["vec_id"]), v.tolist()))
        if r["vec_id"] < 5:
            qids.append(int(r["vec_id"]))
            nb = v + 0.05 * rng.standard_normal(v.size) * np.abs(v).mean()
            rows.append((10_000 + int(r["vec_id"]), nb.tolist()))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = lsh_cosine_topk(vecs, qids, k=3, n_planes=8).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in approx if r["rank"] == 1}
    found = sum(1 for q in qids if top1.get(q) == 10_000 + q)
    assert found >= 4, top1
    # exact re-rank correctness: approx cosines must equal brute force
    exact = cosine_topk(vecs, qids, k=500).collect()
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        assert r["cosine"] == pytest.approx(exact_cos[key], rel=1e-9)


def test_text_profile(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog in the garden"),
            (1, "x"),
            (2, "!!! ??? ;;; :::"),
        ],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert prof[0]["lang_id"] == "en"
    assert prof[0]["n_tokens"] == 12
    assert prof[0]["quality_score"] > prof[1]["quality_score"]
    assert prof[0]["quality_score"] > prof[2]["quality_score"]
    assert prof[2]["punct_ratio"] > 0.5
    # fingerprint deterministic
    prof2 = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert prof[0]["fingerprint"] == prof2[0]["fingerprint"]


def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["features"]) == 16
        assert r["n_bytes"] > 0
    # deterministic
    feats2 = extract_features(synth_media(spark, n=30), fake=True).collect()
    a = {r["media_id"]: r["features"] for r in feats}
    b = {r["media_id"]: r["features"] for r in feats2}
    assert a == b
    # real decoder not available → must raise, not silently fake
    with pytest.raises(Exception):
        extract_features(synth_media(spark, n=4), fake=False).collect()
    frames = frame_sample(synth_media(spark, n=30), every_ms=10000).collect()
    assert all(r["frame_ms"] % 10000 == 0 for r in frames)


def test_metrics_hand_computed(spark):
    # query A: ranked [1,2,3,4], rel docs {2,3,9} (9 unretrieved), graded
    ranked = spark.createDataFrame(
        [("A", 1, 1), ("A", 2, 2), ("A", 3, 3), ("A", 4, 4)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("A", 2, 2), ("A", 3, 1), ("A", 9, 1)],
        "query_id string, doc_id long, rel int",
    )
    m = per_query_metrics(ranked, qrels, k=4).collect()[0]
    assert m["p_at_k"] == pytest.approx(2 / 4)
    assert m["r_at_k"] == pytest.approx(2 / 3)
    # AP = (P@2 + P@3)/3 = (1/2 + 2/3)/3
    assert m["ap"] == pytest.approx((0.5 + 2 / 3) / 3)
    assert m["rr"] == pytest.approx(1 / 2)
    # DCG = (2^2-1)/log2(3) + (2^1-1)/log2(4); IDCG = 3/log2(2)+1/log2(3)+1/log2(4)
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert m["ndcg"] == pytest.approx(dcg / idcg)
    run = run_metrics(ranked, qrels, k=4).collect()[0]
    assert run["map"] == pytest.approx(m["ap"])


def test_full_list_metrics_and_truncated_metrics(spark):
    """AP/RR/bpref/R-prec evaluate the FULL retrieved list; P@k/nDCG/ERR
    truncate (reference metrics.py:246,718,780 vs :146,413,521). A
    relevant doc beyond rank k must count for AP/bpref/r_prec but not
    P@k; an out-of-scale grade must not poison ERR (clamped to 3)."""
    ranked = spark.createDataFrame(
        [("q", d, r) for r, d in enumerate([10, 11, 12, 13, 14, 15], start=1)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 10, 5), ("q", 15, 1)],  # grade 5 > ERR max grade 3
        "query_id string, doc_id long, rel int",
    )
    m = per_query_metrics(ranked, qrels, k=3).collect()[0]
    assert m["p_at_k"] == pytest.approx(1 / 3)  # only doc 10 within k=3
    # AP over the full list: hits at rank 1 and 6 → (1/1 + 2/6)/2
    assert m["ap"] == pytest.approx((1.0 + 2 / 6) / 2)
    # bpref: doc10 has 0 nonrel before; doc15 has 4 → 1 - min(4,2)/2 = 0
    assert m["bpref"] == pytest.approx((1.0 + 0.0) / 2)
    assert m["r_prec"] == pytest.approx(1 / 2)  # R=2, hits in top-2 = 1
    # ERR: grade clamped to 3 → R1 = 7/8; finite, no null-skip inflation
    assert m["err"] == pytest.approx(7 / 8)
    run = run_metrics(ranked, qrels, k=3).collect()[0]
    assert run["gmap"] == pytest.approx(
        math.exp(math.log(m["ap"] + 1e-10)), rel=1e-9
    )
    assert run["success_rate"] == 1.0


def test_ivf_full_probe_equals_bruteforce(spark):
    """With n_probe = n_list every inverted list is probed, so IVF must
    reproduce the exact brute-force top-k (same ids, same order)."""
    from news_information_retrieval_system_spark.ops.similarity import ivf_cosine_topk

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(60)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 5, 11]
    exact = cosine_topk(vecs, qids, k=5).collect()
    ivf = ivf_cosine_topk(vecs, qids, k=5, n_list=4, n_probe=4, n_iters=2).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted((r["query_id"], r["rank"], r["vec_id"]) for r in ivf) == \
           sorted((r["query_id"], r["rank"], r["vec_id"]) for r in exact)
    ec = {key(r): r["cosine"] for r in exact}
    for r in ivf:
        assert r["cosine"] == pytest.approx(ec[key(r)], abs=1e-9)


def test_ivf_partial_probe_subset_and_recall(spark):
    """Partial probing returns a subset of each probed list's vectors,
    ranked exactly; planted near-identical neighbors (same list by
    construction) must be recalled at rank 1."""
    from news_information_retrieval_system_spark.ops.similarity import ivf_cosine_topk

    rng = np.random.default_rng(3)
    base = [rng.standard_normal(16) for _ in range(4)]
    rows = []
    for i in range(40):
        v = base[i % 4] + 0.01 * rng.standard_normal(16)
        rows.append((i, v.tolist()))
    # planted: vec 100 ~ vec 0 (cluster of base[0])
    rows.append((100, (base[0] + 0.001 * rng.standard_normal(16)).tolist()))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_cosine_topk(vecs, [100], k=3, n_list=4, n_probe=1, n_iters=3).collect()
    assert out, "probed list must contain the planted cluster"
    top = min(out, key=lambda r: r["rank"])
    # rank-1 neighbor comes from base[0]'s cluster: ids ≡ 0 (mod 4)
    assert top["vec_id"] % 4 == 0
