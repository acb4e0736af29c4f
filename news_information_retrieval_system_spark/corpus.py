"""Deterministic distributed synthetic transcript generator.

Produces the BASELINE.json input_hint table shape
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` at any scale, fully deterministically and independent of
partitioning: every value is a pure function of the global turn id, computed
with vectorized splitmix64 hashing inside an Arrow-batched ``mapInPandas``.
Term distribution is Zipf(1.1) over a fixed vocabulary, so a handful of
"stopword-hot" terms dominate — exactly the skew the north rule requires the
index build to survive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "python", "browser", "editor"])

_VOCAB_SIZE = 8192
_ZIPF_S = 1.1
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def vocabulary(size: int = _VOCAB_SIZE) -> np.ndarray:
    """Fixed synthetic vocabulary: w0000..wNNNN plus a few real-ish words."""
    head = np.array(
        "the a of to and in is for on with query spark index search term "
        "data table join filter agg scan row fast slow value key hash part "
        "batch window order column small line customer".split()
    )
    tail = np.array([f"w{i:04d}" for i in range(size - len(head))])
    return np.concatenate([head, tail])


def _zipf_cdf(size: int = _VOCAB_SIZE, s: float = _ZIPF_S) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — deterministic uniform 64-bit hash."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _uniform01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    turns_per_conv: int = 20,
    min_len: int = 4,
    max_len: int = 48,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generator: ``spark.range`` → mapInPandas, no driver data."""
    vocab = vocabulary()
    cdf = _zipf_cdf()
    seed64 = np.uint64(seed)

    def gen(batches):
        for pdf in batches:
            gid = pdf["id"].to_numpy(dtype=np.uint64)
            n = len(gid)
            conv = gid // np.uint64(turns_per_conv)
            turn = (gid % np.uint64(turns_per_conv)).astype(np.int32)
            h = _splitmix64(gid * np.uint64(2654435761) + seed64)
            lengths = (min_len + (h % np.uint64(max_len - min_len + 1))).astype(np.int64)
            total = int(lengths.sum())
            # token t of turn d = vocab[zipf_inv(uniform(hash(d, t)))]
            doc_rep = np.repeat(gid, lengths)
            tok_idx = np.concatenate([np.arange(l, dtype=np.uint64) for l in lengths])
            u = _uniform01(
                doc_rep * np.uint64(0x9E3779B1) + tok_idx * np.uint64(0x85EBCA77) + seed64
            )
            words = vocab[np.searchsorted(cdf, u, side="left").clip(0, len(vocab) - 1)]
            bounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=bounds[1:])
            texts = [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n)]
            roles = ROLES[(_splitmix64(gid + np.uint64(7)) % np.uint64(len(ROLES))).astype(int)]
            tools = TOOLS[(_splitmix64(gid + np.uint64(13)) % np.uint64(len(TOOLS))).astype(int)]
            ts = pd.Timestamp("2025-01-01") + pd.to_timedelta(
                conv.astype(np.int64) * 3600 + turn.astype(np.int64) * 37, unit="s"
            )
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv).map("conv-{:08d}".format),
                    "turn_idx": turn,
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": ts,
                }
            )
            del words, doc_rep, tok_idx

    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_turns, 1, parts)
    return base.mapInPandas(gen, schema=SCHEMA)
