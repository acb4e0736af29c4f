"""Text analysis for corpus curation: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All JVM-side Column expressions except the rolling-hash fingerprint (an
Arrow-batched numpy UDF). Quality-heuristic shape follows the reference's
text-quality service (src/ir_app/services/text_quality.py) generalized to
ratio features.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..tokenize import tokens_col

EN_STOPWORDS = (
    "the a an of to and in is are was were for on with as by at from it "
    "this that be or not"
).split()


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs
# (GPT-2-style pre-tokenization simplified to an RE2- and Java-compatible
# alternation — no lookahead, so an independent engine can recompute it).
_BPE_PIECES_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def llm_token_count_col(text: Column) -> Column:
    """Approximate LLM (BPE) token count, fully deterministic: split into
    pre-tokenizer pieces, then charge each piece ceil(len/4) tokens (the
    ~4-chars-per-BPE-token heuristic) with pure integer arithmetic. The
    counter a training-data pipeline uses for budget/packing estimates
    before the real tokenizer runs."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(_BPE_PIECES_RE), 0)
    per_piece = F.transform(pieces, lambda p: F.floor((F.length(p) + 3) / 4))
    return F.aggregate(per_piece, F.lit(0).cast("long"), lambda acc, x: acc + x)


def lang_id_col(text: Column) -> Column:
    """n-gram/script heuristic: zh if CJK chars dominate, en if ASCII
    letters dominate and stopwords appear, else 'unk'."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    ascii_l = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    total = F.greatest(F.length(text), F.lit(1))
    toks = tokens_col(text)
    sw_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    return (
        F.when(cjk / total > 0.2, F.lit("zh"))
        .when((ascii_l / total > 0.5) & (sw_hits > 0), F.lit("en"))
        .when(ascii_l / total > 0.5, F.lit("en-ish"))
        .otherwise(F.lit("unk"))
    )


def quality_score_col(t: Column) -> Column:
    """The quality heuristic as a single row-local Column expression —
    reusable anywhere a plain filter predicate is needed (notably the
    stateless streaming curation pass, where a separate features frame
    can't be joined back). Bit-identical to quality_features' score."""
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    sw = F.size(
        F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in EN_STOPWORDS]))
    )
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tokens,
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    length_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - punct_ratio * 5.0, F.lit(0.0))
    wordlen_score = F.when((avg_tok >= 2.5) & (avg_tok <= 10.0), 1.0).otherwise(0.5)
    sw_score = F.when((sw_ratio > 0.05) & (sw_ratio < 0.7), 1.0).otherwise(0.6)
    return (
        length_score * 0.4 + punct_score * 0.2 + wordlen_score * 0.2 + sw_score * 0.2
    )


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, quality_score) — quality_score in [0,1]."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    sw = F.size(
        F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in EN_STOPWORDS]))
    )
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tokens,
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    # heuristic: long enough, low punctuation noise, word lengths sane,
    # some-but-not-all stopwords — composed in quality_score_col
    quality = quality_score_col(t)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        avg_tok.cast("double").alias("avg_token_len"),
        punct_ratio.cast("double").alias("punct_ratio"),
        sw_ratio.cast("double").alias("stopword_ratio"),
        quality.cast("double").alias("quality_score"),
    )


FP_K = 8  # char n-gram width
FP_BASE = 131
FP_MOD = 2147483647  # 2^31 - 1: keeps every partial sum inside int64


def fingerprint_col(text: Column) -> Column:
    """Winnowing-style document fingerprint as a PURE JVM expression:
    min over char 8-gram positions j of
    ``(Σ_{l<8} (codepoint(text[j+l]) % 256) · FP_BASE^(7-l)) % FP_MOD``.
    Bounded arithmetic (255·131^7·8 < 2^63), so ANY engine computes it
    identically — this is what makes a DuckDB oracle possible, unlike the
    uint64-wraparound Karp-Rabin UDF it replaces. Texts shorter than 8
    chars fall back to the codepoint sum; empty/null → 0."""
    t = F.col(text) if isinstance(text, str) else text
    powers = [FP_BASE ** (FP_K - 1 - l) for l in range(FP_K)]

    def ngram_hash(j):  # j: 1-based position Column
        s = F.lit(0).cast("long")
        for l, p in enumerate(powers):
            code = F.pmod(F.ascii(F.substring(t, j + F.lit(l), F.lit(1))), F.lit(256))
            s = s + code.cast("long") * F.lit(p)
        return F.pmod(s, F.lit(FP_MOD))

    char_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda j: F.pmod(F.ascii(F.substring(t, j, F.lit(1))), F.lit(256)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        F.when(
            F.length(t) >= FP_K,
            F.array_min(
                F.transform(F.sequence(F.lit(1), F.length(t) - (FP_K - 1)), ngram_hash)
            ),
        )
        .when(F.length(t) > 0, char_sum)
        .otherwise(F.lit(0).cast("long"))
    )


@F.pandas_udf(LongType())
def rolling_fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Winnowing-style fingerprint: min of Karp-Rabin rolling hashes over
    char 8-grams (order-sensitive, robust to small edits elsewhere)."""
    K = 8
    BASE = np.uint64(1000003)
    out = np.empty(len(texts), dtype=np.int64)
    powK = BASE ** np.uint64(K - 1)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if b.size < K:
            out[i] = int(b.sum())
            continue
        # vectorized rolling hash: h_j = sum b[j+l] * BASE^(K-1-l)
        h = np.zeros(b.size - K + 1, dtype=np.uint64)
        for l in range(K):
            h = h * np.uint64(1) + b[l : b.size - K + 1 + l] * (BASE ** np.uint64(K - 1 - l))
        out[i] = np.int64(h.min().astype(np.int64))
    return pd.Series(out)


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full per-doc text profile: quality features + lang + fingerprint."""
    feats = quality_features(docs, text_col, id_col)
    extra = docs.select(
        F.col(id_col).alias("doc_id"),
        lang_id_col(F.col(text_col)).alias("lang_id"),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
    )
    return feats.join(extra, "doc_id")
