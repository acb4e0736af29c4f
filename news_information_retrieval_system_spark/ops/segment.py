"""Dictionary-based Chinese word segmentation (SURVEY T3/T4 testable
fallback) — forward maximum matching, Spark-first.

The reference's Chinese tokenization is jieba (T3, import-gated here —
absent in this environment) or CKIP BERT inference (T4, declared
non-goal): `/root/reference/src/ir/text/chinese_tokenizer.py:118-310`.
Both are heavyweight models; this module supplies the deterministic
classical fallback — forward maximum matching (FMM) against a broadcast
lexicon — so the Chinese segmentation PATH is exercisable and testable
without either model: the same tokenize→index→query pipeline runs over
CJK text with a caller-supplied dictionary, and a jieba/CKIP tagger can
replace the matcher behind the same contract when available.

Semantics (classical FMM): scan left to right; at each position take the
LONGEST lexicon word starting there (up to the lexicon's max word
length); if none matches, emit the single character and advance one.
Fully deterministic — no probabilities, no tie ambiguity (longest wins;
equal-length duplicates are impossible in a set).

Scale: the lexicon rides the closure into an Arrow-batched pandas UDF
(pass a broadcast variable's ``.value`` for very large dictionaries);
matching is per-row with a per-batch prefix-set, no shuffle. Lexicon
lookups use a set of exact words plus the max length, so each position
costs at most ``max_word_len`` set probes.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def _fmm_one(text: str | None, lex: set[str], max_len: int) -> list[str]:
    if not text:
        return []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        match = None
        for ln in range(min(max_len, n - i), 0, -1):
            cand = text[i : i + ln]
            if cand in lex:
                match = cand
                break
        if match is None:
            match = text[i]
        out.append(match)
        i += len(match)
    return out


def fmm_segment_udf(lexicon: Iterable[str]):
    """Arrow-batched pandas UDF: text → array<string> of FMM segments."""
    lex = {w for w in lexicon if w}
    max_len = max((len(w) for w in lex), default=1)

    @F.pandas_udf(ArrayType(StringType()))
    def _seg(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _fmm_one(t, lex, max_len))

    return _seg


def segment_text(
    df: DataFrame,
    lexicon: Iterable[str],
    text_col: str = "text",
    drop_whitespace: bool = True,
) -> Column:
    """FMM segment column for ``df[text_col]``. Whitespace characters
    (never lexicon words) are dropped from the output by default, so
    mixed CJK/ASCII text degrades gracefully."""
    toks = fmm_segment_udf(lexicon)(F.col(text_col))
    if drop_whitespace:
        toks = F.filter(toks, lambda t: F.trim(t) != F.lit(""))
    return toks
