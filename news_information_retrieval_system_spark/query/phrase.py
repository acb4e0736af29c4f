"""Phrase / proximity / window queries over the positional index.

Reference semantics:
* phrase: docs containing all terms with consecutive positions
  (src/ir/index/positional_index.py:217-316 — anchor first-term positions,
  check +1, +2, ... offsets)
* NEAR/n: any pair of positions within distance n
  (positional_index.py:318-393 two-pointer scan)
* window: all k terms inside a token window (positional_index.py:395-469)

Spark plan: per-term position rows ``(term, doc_id, positions)`` joined on
doc_id; the offset check runs as JVM higher-order array functions
(``filter``/``exists``) — no Python, no explode of position lists. A
k-term phrase is k-1 doc_id equi-joins, each shrinking the candidate set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_positions(positional: DataFrame, term: str, alias: str) -> DataFrame:
    return positional.filter(F.col("term") == term).select(
        "doc_id", F.col("positions").alias(alias)
    )


def phrase_match(positional: DataFrame, terms: Sequence[str]) -> DataFrame:
    """→ (doc_id, match_count): docs where terms appear consecutively.

    match_count = number of start positions of the full phrase.
    """
    if not terms:
        raise ValueError("empty phrase")
    anchors = _term_positions(positional, terms[0], "anchor")
    for i, t in enumerate(terms[1:], start=1):
        nxt = _term_positions(positional, t, f"p{i}")
        anchors = (
            anchors.join(nxt, "doc_id")
            .withColumn(
                "anchor",
                F.expr(f"filter(anchor, x -> array_contains(p{i}, x + {i}))"),
            )
            .drop(f"p{i}")
            .filter(F.size("anchor") > 0)
        )
    return anchors.select("doc_id", F.size("anchor").alias("match_count"))


def proximity_match(positional: DataFrame, t1: str, t2: str, n: int) -> DataFrame:
    """NEAR/n: docs where some |pos(t1) - pos(t2)| <= n. → (doc_id)."""
    a = _term_positions(positional, t1, "pa")
    b = _term_positions(positional, t2, "pb")
    return (
        a.join(b, "doc_id")
        .filter(F.expr(f"exists(pa, x -> exists(pb, y -> abs(x - y) <= {n}))"))
        .select("doc_id")
    )


def window_match(positional: DataFrame, terms: Sequence[str], window: int) -> DataFrame:
    """All terms within a token window of given size. → (doc_id).

    Semantics of positional_index.py:395-469: exists an assignment of one
    position per term with max-min < window. Checked via min/max over the
    per-term position arrays with a JVM expression on the k-joined row:
    exists p1 in pos1: for all other terms exists pj within [p1-window+1,
    p1+window-1] and the chosen set spans < window — implemented as the
    standard sliding check over the union of positions.
    """
    if not terms:
        raise ValueError("empty window query")
    uniq = list(dict.fromkeys(terms))
    df = _term_positions(positional, uniq[0], "p0")
    for i, t in enumerate(uniq[1:], start=1):
        df = df.join(_term_positions(positional, t, f"p{i}"), "doc_id")
    k = len(uniq)
    # anchor on p0: a window [a, a+window) must contain one position of each
    # term list (any term can be leftmost, so slide the anchor over every
    # list by checking each list as anchor).
    # exact check: the chosen positions all fit in SOME window of size
    # `window` iff, anchoring at the minimum chosen position x, every other
    # list has a position y with x <= y < x + window. Any term can hold the
    # minimum, so OR over anchors.
    conds = []
    for a in range(k):
        per_term = [
            f"exists(p{j}, y -> y >= x and y < x + {window})" for j in range(k) if j != a
        ]
        conds.append(f"exists(p{a}, x -> {' and '.join(per_term)})" if per_term else "true")
    return df.filter(F.expr(" or ".join(conds))).select("doc_id")
