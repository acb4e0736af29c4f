"""BPE tokenizer-induction driver entries (LLM-pipeline face).

* bpe_merges — the full 24-round training loop, value-checked: the
  oracle re-derives EVERY round in DuckDB (pair counting over the
  evolving vocab, deterministic argmax ``f DESC, lhs, rhs``, merge
  application as a marker-string replace) — both engines' leftmost
  non-overlapping ``replace`` coincide with BPE's left-to-right merge
  pass because the ``<a><b>`` marker encoding shares no boundary
  characters between adjacent matches.
* bpe_token_counts — document token budgets under the trained vocab
  (doc-word explode → vocab join → groupBy), oracle re-encoded from
  the same 24 re-derived rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs
from .ops.bpe import bpe_token_counts, train_bpe

N_BPE_MERGES = 24


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = train_bpe(_docs(spark, sf_dir), n_merges=N_BPE_MERGES)
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, f long"
    )


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    _, words = train_bpe(d, n_merges=N_BPE_MERGES)
    return bpe_token_counts(d, words).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_words",
        "n_bpe_tokens",
    )


# --------------------------------------------------------------- oracles
# The training loop unrolled: w{r} = vocab state entering round r,
# s/p{r} = symbol/pair views, b{r} = that round's argmax merge.
# w{r} and b{r} are each referenced twice, so they MUST be MATERIALIZED:
# inlined CTEs double per round and the 24-round chain would expand to
# 2^24 base-table scans.
_W0 = """
w0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(list_transform(range(1, length(word) + 1),
             i -> '<' || substring(word, i, 1) || '>'), '') AS enc
  FROM (
    SELECT word, count(*) AS freq FROM (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents
    ) WHERE regexp_matches(word, '^[a-z0-9]+$')
    GROUP BY word
  )
)"""


def _rounds_sql(n: int) -> str:
    parts = [_W0]
    for r in range(n):
        parts.append(f"""
s{r} AS (SELECT freq, regexp_extract_all(enc, '<([^>]*)>', 1) AS syms
         FROM w{r}),
p{r} AS (SELECT freq,
                unnest(syms[1:len(syms) - 1]) AS lhs,
                unnest(syms[2:len(syms)]) AS rhs
         FROM s{r} WHERE len(syms) >= 2),
b{r} AS MATERIALIZED (SELECT lhs, rhs, f FROM (
           SELECT lhs, rhs, sum(freq) AS f FROM p{r} GROUP BY 1, 2)
         ORDER BY f DESC, lhs, rhs LIMIT 1),
w{r + 1} AS MATERIALIZED (SELECT word, freq,
             replace(enc, (SELECT '<' || lhs || '><' || rhs || '>' FROM b{r}),
                          (SELECT '<' || lhs || rhs || '>' FROM b{r})) AS enc
             FROM w{r})""")
    return "WITH " + ",".join(parts)


_MERGE_ROWS = "\nUNION ALL\n".join(
    f"SELECT {r + 1} AS rank, lhs, rhs, f FROM b{r}"
    for r in range(N_BPE_MERGES)
)

ORACLES: dict[str, str] = {}

ORACLES["bpe_merges"] = f"""{_rounds_sql(N_BPE_MERGES)}
SELECT cast(rank AS BIGINT) AS rank, lhs, rhs, cast(f AS BIGINT) AS f
FROM ({_MERGE_ROWS})
"""

ORACLES["bpe_token_counts"] = f"""{_rounds_sql(N_BPE_MERGES)},
vocab AS (
  SELECT word,
         length(enc) - length(replace(enc, '<', '')) AS n_sym
  FROM w{N_BPE_MERGES}
),
dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
)
SELECT cast(dw.doc_id AS BIGINT) AS doc_id,
       cast(count(*) AS BIGINT) AS n_words,
       cast(sum(coalesce(vocab.n_sym, 1)) AS BIGINT) AS n_bpe_tokens
FROM dw LEFT JOIN vocab USING (word)
GROUP BY dw.doc_id
"""


def registry() -> dict:
    return {
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
    }
