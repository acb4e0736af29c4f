"""n-gram LM + collocation measures vs an independent pure-Python mirror
of the reference semantics (ngram.py:128-467, collocation.py:137-518)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from news_information_retrieval_system_spark.ops.collocation import (
    collocations,
    ngram_lm_logprob,
)
from news_information_retrieval_system_spark.tokenize import py_tokenize


def _py_lm(train_texts, eval_texts, n, add_k):
    """Reference-mirror: context = previous n-1 tokens (empty tuple for
    n=1), Laplace (c+k)/(c_ctx+kV), logprob summed per doc, ppx =
    exp(-mean ln p). Windows clipped to full n-grams only."""
    counts: Counter = Counter()
    ctx_counts: Counter = Counter()
    vocab = set()
    for t in train_texts:
        toks = py_tokenize(t)
        vocab.update(toks)
        for i in range(len(toks) - n + 1):
            ctx = tuple(toks[i : i + n - 1])
            w = toks[i + n - 1]
            counts[(ctx, w)] += 1
            ctx_counts[ctx] += 1
    v = len(vocab)
    out = {}
    for doc_id, t in eval_texts:
        toks = py_tokenize(t)
        lp, ng = 0.0, 0
        for i in range(len(toks) - n + 1):
            ctx = tuple(toks[i : i + n - 1])
            w = toks[i + n - 1]
            p = (counts.get((ctx, w), 0) + add_k) / (
                ctx_counts.get(ctx, 0) + add_k * v
            )
            lp += math.log(p)
            ng += 1
        if ng:
            out[doc_id] = (lp, ng, math.exp(-lp / ng))
    return out


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_lm_matches_reference_mirror(spark, mini_docs, n):
    rows = [(r["doc_id"], r["text"]) for r in mini_docs.collect()]
    want = _py_lm([t for _, t in rows], rows, n, add_k=1.0)
    got = {
        r["doc_id"]: (r["logprob"], r["n_grams"], r["perplexity"])
        for r in ngram_lm_logprob(mini_docs, mini_docs, n=n, add_k=1.0).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1]
        assert got[d][0] == pytest.approx(want[d][0], rel=1e-12)
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-12)


def test_collocation_measures_hand_computed(spark):
    """4 docs, bigram 'big data' n11=3: chi2 and t-score against the 2x2
    contingency formulas computed by hand (reference collocation.py:320
    chi-square, :373 t-score with bigram-slot marginals)."""
    docs = spark.createDataFrame(
        [
            (0, "big data needs big data tools"),
            (1, "big data wins"),
            (2, "small data here"),
            (3, "big ideas win"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocations(docs, min_count=1).collect()
    }
    r = rows[("big", "data")]
    # bigram slots per doc: 5,2,2,2 → n=11; n11=3; c1(big)=4;
    # c2(data)=4 (doc0 twice, doc1 once, doc2 'small data' once)
    n, n11, c1, c2 = 11.0, 3.0, 4.0, 4.0
    e11 = c1 * c2 / n
    e12 = c1 * (n - c2) / n
    e21 = (n - c1) * c2 / n
    e22 = (n - c1) * (n - c2) / n
    chi2 = (
        (n11 - e11) ** 2 / e11
        + ((c1 - n11) - e12) ** 2 / e12
        + ((c2 - n11) - e21) ** 2 / e21
        + ((n - c1 - c2 + n11) - e22) ** 2 / e22
    )
    t = (n11 / n - (c1 / n) * (c2 / n)) / math.sqrt((n11 / n) / n)
    assert r["n11"] == 3
    assert r["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert r["t_score"] == pytest.approx(t, rel=1e-12)
    # PMI/Dice/LLR still present and finite alongside the new columns
    for col in ("pmi", "dice", "llr"):
        assert math.isfinite(r[col])
