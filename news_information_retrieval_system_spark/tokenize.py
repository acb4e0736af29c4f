"""Tokenization — the "scan projection" of this engine.

Two paths with identical semantics on ASCII text:

* ``tokens_col`` — pure JVM Column expression (whole-stage codegen, no
  Python in the hot path). This is the default at scale.
* ``tokenize_udf`` — Arrow-batched pandas UDF replicating the reference
  pipeline exactly (NFKC normalize, 臺→台, lowercase, ``\\b\\w+\\b``
  token regex), with an optional jieba hook for Chinese text.

Reference semantics: default tokenizer ``re.findall(r'\\b\\w+\\b',
text.lower())`` (src/ir/index/inverted_index.py:89-105); normalization
NFKC + 臺→台 + lowercase + whitespace collapse
(src/ir_app/services/index_service.py:71-81); jieba segmentation
(src/ir/text/chinese_tokenizer.py:254-270).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Python \w ≈ unicode letters + digits + underscore. The Java regex below
# matches it on the letter/number plane (marks/connector punctuation differ
# only for exotic scripts, irrelevant for our corpora and covered by tests).
_JVM_SPLIT_PATTERN = r"[^\p{L}\p{N}_]+"
_PY_TOKEN_RE = re.compile(r"\b\w+\b")


def tokens_col(text: Column | str) -> Column:
    """JVM-side tokenizer: lowercase, split on non-word runs, drop empties.

    Stays inside whole-stage codegen — no Python worker round-trip.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), _JVM_SPLIT_PATTERN)
    return F.filter(toks, lambda x: x != F.lit(""))


def normalize_text(s: str) -> str:
    """Reference text normalization (index_service.py:71-81)."""
    if s is None:
        return ""
    s = unicodedata.normalize("NFKC", s)
    s = s.replace("臺", "台")
    s = s.lower()
    return " ".join(s.split())


def py_tokenize(s: str) -> List[str]:
    """Pure-Python reference tokenizer — also used by the rank oracle."""
    return _PY_TOKEN_RE.findall(normalize_text(s))


def _jieba_cut(texts: Iterable[str]) -> List[List[str]]:  # pragma: no cover
    """Optional jieba path for Chinese corpora; lazy per-executor init."""
    import jieba  # gated: not installed in this environment

    return [[t for t in jieba.cut(normalize_text(x)) if _PY_TOKEN_RE.search(t)] for x in texts]


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched reference-parity tokenizer (NFKC + \\w regex)."""
    return texts.map(py_tokenize)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_jieba_udf(texts: pd.Series) -> pd.Series:  # pragma: no cover
    """Jieba segmentation path (reference T2/T3); requires jieba on executors."""
    return pd.Series(_jieba_cut(texts.fillna("")))


def tokenizer(mode: str = "fast"):
    """Return a Column-producing tokenizer: 'fast' (JVM), 'reference'
    (pandas UDF, exact reference semantics incl. NFKC), 'jieba'."""
    if mode == "fast":
        return tokens_col
    if mode == "reference":
        return lambda c: tokenize_udf(F.col(c) if isinstance(c, str) else c)
    if mode == "jieba":  # pragma: no cover
        return lambda c: tokenize_jieba_udf(F.col(c) if isinstance(c, str) else c)
    raise ValueError(f"unknown tokenizer mode: {mode}")
