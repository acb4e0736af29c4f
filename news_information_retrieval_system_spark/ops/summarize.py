"""Static extractive summarization: lead-k and TF-IDF key sentences
(SURVEY §2 A9).

Reference: src/ir/summarize/static.py —
* ``segment_sentences`` (:142-190): split on ``[.!?。！？]+``, position
  counter over non-empty raw sentences, keep sentences whose token count
  is within [min_sentence_length=5, max_sentence_length=100];
* ``lead_k_summarization`` (:247-302): first k kept sentences;
* ``key_sentence_extraction`` (:335-411): TF over the document's kept
  sentences, sentence-level IDF ``ln(n_sentences / df)`` (:211-245,
  each sentence = one "document"), sentence score = Σ tf·idf over its
  tokens (with multiplicity) / sentence length (:304-333), optional
  position bias ``score × (1 + 0.5 / (1 + position))``; top-k by score
  (the reference's stable sort ⇒ position-ascending tiebreak), emitted
  in position order.

Spark shape: pure JVM — one regexp split + posexplode per document,
then groupBy aggregations keyed by (doc_id[, term]); no Python in the
path, no corpus-wide state (all statistics are per-document), so the
operator scales as embarrassingly-parallel per-doc work with ordinary
shuffles. Scores snap to 9 decimals before ranking so an independent
SQL engine reproduces the selection exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenize import tokens_col

SENT_SPLIT = "[.!?。！？]+"
MIN_SENT_LEN, MAX_SENT_LEN = 5, 100


def sentences_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = MIN_SENT_LEN,
    max_len: int = MAX_SENT_LEN,
) -> DataFrame:
    """→ (doc_id, position, sentence, tokens, n_tokens): the reference's
    kept sentences. ``position`` counts every non-empty raw sentence
    (static.py:172-188 increments past length-filtered ones too)."""
    raw = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), SENT_SPLIT)).alias("i", "s"),
    ).withColumn("sentence", F.trim("s"))
    nonempty = raw.filter(F.col("sentence") != "")
    w = Window.partitionBy("doc_id").orderBy("i")
    pos = nonempty.withColumn("position", F.row_number().over(w) - 1)
    toks = pos.withColumn("tokens", tokens_col("sentence")).withColumn(
        "n_tokens", F.size("tokens")
    )
    return toks.filter(
        (F.col("n_tokens") >= min_len) & (F.col("n_tokens") <= max_len)
    ).select("doc_id", "position", "sentence", "tokens", "n_tokens")


def lead_k(docs: DataFrame, k: int = 3, **kw) -> DataFrame:
    """→ (doc_id, position, sentence): first k kept sentences per doc
    (static.py:247-302)."""
    sents = sentences_df(docs, **kw)
    w = Window.partitionBy("doc_id").orderBy("position")
    return (
        sents.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "position", "sentence")
    )


def key_sentences(
    docs: DataFrame, k: int = 3, position_bias: bool = True, **kw
) -> DataFrame:
    """→ (doc_id, position, sentence, score): the reference's TF-IDF key
    -sentence summary (static.py:335-411), one row per selected
    sentence, ordered by ``position`` within each doc."""
    sents = sentences_df(docs, **kw)
    tok = sents.select(
        "doc_id", "position", "n_tokens", F.explode("tokens").alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_sent = sents.groupBy("doc_id").agg(F.count("*").alias("n_sent"))
    df_sent = (
        tok.select("doc_id", "position", "term")
        .distinct()
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("df"))
    )
    idf = df_sent.join(n_sent, "doc_id").withColumn(
        "idf", F.log(F.col("n_sent") / F.col("df"))
    )
    base = (
        tok.join(tf, ["doc_id", "term"])
        .join(idf.select("doc_id", "term", "idf"), ["doc_id", "term"])
        .groupBy("doc_id", "position", "n_tokens")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("raw"))
        .withColumn("base_score", F.col("raw") / F.col("n_tokens"))
    )
    score = (
        F.col("base_score")
        * (F.lit(1.0) + 0.5 / (F.lit(1.0) + F.col("position")))
        if position_bias
        else F.col("base_score")
    )
    scored = base.withColumn("score", F.round(score, 9))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("position"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .join(sents.select("doc_id", "position", "sentence"), ["doc_id", "position"])
        .select("doc_id", "position", "sentence", "score")
    )
