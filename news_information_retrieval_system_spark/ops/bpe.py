"""Distributed BPE tokenizer induction + encoding (LLM-pipeline face).

Byte-pair-encoding vocabulary training (Sennrich et al. 2016, public
algorithm) over the corpus, Spark-first: the training state is the
DISTINCT-WORD table (vocab-sized, not corpus-sized — the one groupBy
that touches the full corpus happens once, up front), and each merge
round is

    1. pair counts: one map-side-combinable aggregation over the
       vocab's adjacent symbol pairs, weighted by word frequency;
    2. argmax: a deterministic ``ORDER BY f DESC, lhs, rhs LIMIT 1`` —
       the only driver-side data is the k merge rules themselves;
    3. merge application: ONE JVM ``replace`` over the word encoding.

The encoding trick that keeps everything declarative: a word's symbol
sequence is stored as a marker string ``<h><e><l><l><o>``. Applying
merge (a, b) is ``replace(enc, '<a><b>', '<ab>')`` — the closing+opening
marker pair means matches can never share a boundary character, so the
engine's leftmost non-overlapping replace semantics coincide EXACTLY
with BPE's left-to-right non-overlapping merge pass (`` <x><x><x><x> ``
→ ``<xx><xx>``, never the stranded ``<xx><x><x>`` a space-delimited
representation produces). The same property holds for SQL ``replace()``,
which is what lets the DuckDB oracle re-derive the full 24-round
training loop from first principles.

Scale: the vocab table at 100 TB is ~10⁸ rows; each round is one
partial-agg shuffle of that table plus a narrow map. Lineage is cut
with ``localCheckpoint`` every few rounds so round N's plan does not
nest N aggregations. Words are restricted to ``^[a-z0-9]+$`` (the
marker characters must not occur inside symbols); out-of-alphabet
words are simply not merge candidates — callers with wider alphabets
remap the markers.

Encoding reuses the same table: after training, a word's token count is
just its ``<`` count, and document-level BPE token counts are an
(doc word) → vocab join — no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col

WORD_RE = "^[a-z0-9]+$"


def char_markers_col(word: Column | str) -> Column:
    """``hello`` → ``<h><e><l><l><o>`` (initial BPE symbol sequence)."""
    col = F.col(word) if isinstance(word, str) else word
    return F.concat_ws(
        "",
        F.transform(
            F.filter(F.split(col, ""), lambda c: c != F.lit("")),
            lambda c: F.concat(F.lit("<"), c, F.lit(">")),
        ),
    )


def n_symbols_col(enc: Column | str) -> Column:
    """Symbol count of a marker string = its ``<`` count."""
    col = F.col(enc) if isinstance(enc, str) else enc
    return (F.length(col) - F.length(F.replace(col, F.lit("<")))).cast("long")


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, enc): the distinct-word training state. The single
    corpus-sized pass; everything after is vocab-sized."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("enc", char_markers_col("word"))
    )


def apply_merge_col(enc: Column | str, lhs: str, rhs: str) -> Column:
    """One BPE merge as one leftmost non-overlapping replace."""
    col = F.col(enc) if isinstance(enc, str) else enc
    return F.replace(col, F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>"))


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = F.regexp_extract_all("enc", F.lit("<([^>]*)>"), 1)
    return (
        words.select("freq", syms.alias("s"))
        .filter(F.size("s") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at("s", i).alias("lhs"),
                        F.element_at("s", i + 1).alias("rhs"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("f"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 24,
    text_col: str = "text",
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE rules; returns (merges, final word table).

    merges = [(rank, lhs, rhs, pair_freq)] with the deterministic
    tie-break ``f DESC, lhs ASC, rhs ASC``. Stops early when the best
    remaining pair's frequency drops below ``min_pair_freq``. The
    driver ever holds only the merge rules (k rows); the word table
    stays distributed and is lineage-cut every ``checkpoint_every``
    rounds so the final plan does not nest ``n_merges`` aggregations.
    """
    words = word_freq_table(docs, text_col).localCheckpoint(eager=True)
    return train_bpe_from_words(
        words,
        n_merges=n_merges,
        min_pair_freq=min_pair_freq,
        checkpoint_every=checkpoint_every,
    )


def train_bpe_from_words(
    words: DataFrame,
    n_merges: int = 24,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Training loop over a pre-built ``(word, freq, enc)`` vocabulary
    table (see ``word_freq_table``) — the unit scaling runs measure."""
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("f"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best or best[0]["f"] < min_pair_freq:
            break
        lhs, rhs, f = best[0]["lhs"], best[0]["rhs"], int(best[0]["f"])
        merges.append((r, lhs, rhs, f))
        words = words.withColumn("enc", apply_merge_col("enc", lhs, rhs))
        if r % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges, words


def encode_col(
    word: Column | str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Marker-string BPE encoding of a word under trained merges —
    ``n_merges`` chained JVM replaces, no Python."""
    enc = char_markers_col(word)
    for _, lhs, rhs, _ in merges:
        enc = apply_merge_col(enc, lhs, rhs)
    return enc


def bpe_token_counts(
    docs: DataFrame,
    trained_words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): document-level token budget
    under the trained vocabulary. Out-of-alphabet words count as one
    token each. Plan: doc-word explode → join the vocab table on word
    (broadcast when small, hash join otherwise) → one groupBy."""
    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("word"),
    )
    vocab = trained_words.select("word", n_symbols_col("enc").alias("n_sym"))
    return (
        doc_words.join(vocab, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("n_sym"), F.lit(1)))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )
