"""Snippets, KWIC, and highlighting for result hydration.

Reference: best-sentence snippet by unique query-term hit count with
180-char trim (src/ir_app/services/search_service.py:627-703), regex
``<mark>`` highlighting, KWIC generator (src/ir/summarize/dynamic.py).

These run over the FINAL top-k rows only (k ~ 10-100), so an Arrow-batched
pandas UDF is the right tool — the corpus never flows through Python.
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..tokenize import py_tokenize

SNIPPET_CHARS = 180
_SENT_SPLIT = re.compile(r"[。！？.!?]")


def _best_sentence(text: str, qterms: set) -> str:
    sentences = [s.strip() for s in _SENT_SPLIT.split(text or "") if s.strip()]
    if not sentences:
        return (text or "")[:SNIPPET_CHARS]
    best, best_hits = sentences[0], -1
    for s in sentences:
        hits = len(qterms.intersection(py_tokenize(s)))
        if hits > best_hits:
            best, best_hits = s, hits
    return best[:SNIPPET_CHARS]


def _highlight(text: str, qterms: set) -> str:
    if not qterms:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in sorted(qterms, key=len, reverse=True)) + r")\b",
        re.IGNORECASE,
    )
    return pat.sub(r"<mark>\1</mark>", text)


def _kwic(text: str, qterms: set, window: int = 5) -> List[str]:
    toks = py_tokenize(text)
    out = []
    for i, t in enumerate(toks):
        if t in qterms:
            lo, hi = max(0, i - window), min(len(toks), i + window + 1)
            out.append(" ".join(toks[lo:i] + [f"[{t}]"] + toks[i + 1 : hi]))
    return out


def with_snippets(results: DataFrame, query_text_col: str = "query_text", text_col: str = "text") -> DataFrame:
    """results must carry the doc text and the query text; adds snippet +
    highlighted snippet columns."""

    @F.pandas_udf(StringType())
    def snippet_udf(texts: pd.Series, queries: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _highlight(_best_sentence(t, set(py_tokenize(q))), set(py_tokenize(q)))
                for t, q in zip(texts, queries)
            ]
        )

    return results.withColumn(
        "snippet", snippet_udf(F.col(text_col), F.col(query_text_col))
    )


def kwic_lines(results: DataFrame, query_text_col: str = "query_text", text_col: str = "text", window: int = 5) -> DataFrame:
    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(StringType()))
    def kwic_udf(texts: pd.Series, queries: pd.Series) -> pd.Series:
        return pd.Series(
            [_kwic(t, set(py_tokenize(q)), window) for t, q in zip(texts, queries)]
        )

    return results.withColumn("kwic", kwic_udf(F.col(text_col), F.col(query_text_col)))
