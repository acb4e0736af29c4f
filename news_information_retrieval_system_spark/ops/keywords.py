"""Keyword / keyphrase extraction: RAKE and TextRank (SURVEY §2 A8).

Reference semantics:
* RAKE — src/ir/keyextract/rake_extractor.py:84-299 (rake-nltk wrapper):
  candidate phrases are maximal runs of consecutive non-stopword tokens,
  phrases longer than ``max_phrase_len`` words are discarded; word score
  = deg(w)/freq(w) where freq counts the word's occurrences in candidate
  phrases and deg sums the lengths of the phrases it occurs in (both with
  multiplicity); phrase score = Σ word scores.
* TextRank — src/ir/keyextract/textrank.py:347-481: undirected word
  co-occurrence graph (edge {w_i, w_j} weight += 1 for j-i < window,
  w_i ≠ w_j), weighted PageRank with damping d: the stochastic step
  distributes PR(u) proportionally to w_uv / W(u); dangling (isolated)
  nodes spread their mass uniformly (networkx semantics).

Spark shape:
* RAKE is pure JVM: per-doc windows mark stopword boundaries, a running
  sum assigns phrase ids, then groupBy phrase / word aggregations — no
  Python in the path, scales as ordinary shuffles keyed by doc_id.
* TextRank groups each document's tokens with ``applyInPandas`` (ONE
  shuffle by doc_id) and runs the power iteration in numpy per document
  — per-doc graphs are tiny (≤ vocabulary of one document), so a dense
  local iteration beats T× corpus-wide join/groupBy rounds. Determinism:
  every iteration snaps PR to a 9-decimal grid with half-away-from-zero
  rounding, so an independent SQL re-implementation lands on identical
  values (the DuckDB oracle does exactly that).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenize import tokens_col

# Stopword list for the synthetic corpora: the function-word head of the
# vocabulary (corpus.py) ∩ reference's English stopword behaviour. Callers
# pass their own list for real corpora.
DEFAULT_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    )


def rake_keywords(
    docs: DataFrame,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
    max_phrase_len: int = 4,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, phrase, n_words, score): top-k RAKE keyphrases per doc.

    Ranking metric is the reference default ``degree_to_frequency``
    (rake_extractor.py:123-131). Ties: higher score first, then phrase
    ascending. Word statistics are computed per document, as rake-nltk
    does for a single ``extract`` call.
    """
    toks = _doc_tokens(docs, text_col, id_col)
    is_stop = F.col("term").isin(list(stopwords))
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = toks.withColumn("stop", is_stop).withColumn(
        "phrase_id", F.sum(F.col("stop").cast("int")).over(w)
    )
    cand = marked.filter(~F.col("stop"))
    phrases = (
        cand.groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("n_words"),
        )
        .filter(F.col("n_words") <= max_phrase_len)
    )
    words = phrases.select(
        "doc_id",
        "phrase_id",
        "n_words",
        F.explode(F.split("phrase", " ")).alias("term"),
    )
    wstats = words.groupBy("doc_id", "term").agg(
        F.count("*").alias("freq"), F.sum("n_words").alias("deg")
    )
    scored = (
        words.join(wstats, ["doc_id", "term"])
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("score"))
        .join(phrases, ["doc_id", "phrase_id"])
    )
    rw = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("phrase")
    )
    return (
        scored.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "phrase", "n_words", "score")
    )


def _snap9(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rounding to 9 decimals (SQL ROUND semantics —
    numpy's own ``round`` is half-to-even). Values here are positive."""
    return np.floor(x * 1e9 + 0.5) / 1e9


def textrank_keywords(
    docs: DataFrame,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
    window: int = 5,
    damping: float = 0.85,
    n_iters: int = 10,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, term, pr): top-k TextRank keywords per document.

    Reference preprocessing drops stopwords and windows over the FILTERED
    token sequence (textrank.py:377-381 keeps filtered-list indices for
    windowing in :418-431); window default 5 matches textrank.py:112.
    Fixed ``n_iters`` weighted-PageRank iterations (the reference runs
    networkx to tolerance, textrank.py:444-481; a fixed iteration count
    with per-iteration 9dp snapping is the deterministic,
    oracle-reproducible equivalent). The reference's optional
    position-weighting / NER-boost rescoring (:483-611, 2025 add-ons) is
    out of scope — this is the ``use_position_weight=False`` path.
    Ties: pr desc, term asc.
    """
    toks = _doc_tokens(docs, text_col, id_col).filter(
        ~F.col("term").isin(list(stopwords))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        order = np.argsort(pdf["pos"].to_numpy())
        terms = pdf["term"].to_numpy(object)[order]
        vocab, tok_ids = np.unique(terms, return_inverse=True)
        n = len(vocab)
        adj = np.zeros((n, n), dtype=np.float64)
        for off in range(1, window):
            if off >= len(tok_ids):
                break
            a, b = tok_ids[:-off], tok_ids[off:]
            mask = a != b
            np.add.at(adj, (a[mask], b[mask]), 1.0)
            np.add.at(adj, (b[mask], a[mask]), 1.0)
        wdeg = adj.sum(axis=1)
        dangling = wdeg == 0.0
        out_norm = np.where(dangling, 1.0, wdeg)
        pr = np.full(n, 1.0 / n)
        pr = _snap9(pr)
        for _ in range(n_iters):
            flow = adj.T @ (pr / out_norm)
            dang = pr[dangling].sum()
            pr = _snap9((1.0 - damping) / n + damping * (flow + dang / n))
        return pd.DataFrame({"doc_id": doc_id, "term": vocab, "pr": pr})

    ranked = toks.groupBy("doc_id").applyInPandas(
        kernel, schema="doc_id long, term string, pr double"
    )
    rw = Window.partitionBy("doc_id").orderBy(F.desc("pr"), F.asc("term"))
    return (
        ranked.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "pr")
    )
