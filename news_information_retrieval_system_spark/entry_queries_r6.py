"""Round-4 late additions: significance testing, corpus audit, PR curve.

* eval_sig_test — paired t-test + Wilcoxon signed-rank + sign counts
  between BM25 and TF-IDF per-query AP on the shared query set
  (the "Statistical testing (paired t-test, Wilcoxon)" use case the
  reference evaluator names, src/ir/eval/metrics.py:62-67). Both
  engines quantize AP to the 5dp fixed point first, so the paired
  deltas are exact integers and every float statistic is the same
  IEEE expression on both sides.
* corpus_audit — per-field completeness + length stats over the planted
  raw-crawler records (corpus_audit_service.py:45-147,225-240), one
  declarative pass + unpivot.
* pr_curve — 11-point interpolated precision-recall per query (TREC
  convention; the reference's "Threshold tuning (Precision-Recall
  curves)" use case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import (
    _SQL_BASE,
    _SQL_BM25_SCORED,
    _SQL_TFIDF_SCORED,
    B,
    K1,
    TOPK,
    _index,
    _qterms,
)
from .entry_queries_ops import _QIDX_VALUES, _qrels
from .entry_queries_r5 import _SQL_RAW, _raw_records
from .eval.metrics import per_query_metrics
from .eval.significance import interpolated_pr, paired_sig_test
from .ops.audit import field_completeness
from .ops.patterns import mi_patterns
from .query.bm25 import score_bm25, topk
from .query.vsm import score_tfidf

AUDIT_FIELDS = ["title", "content", "url", "tags"]


def _ranked(scored: DataFrame) -> DataFrame:
    # rank on 9dp-rounded scores (repo-wide oracle-parity convention)
    return topk(scored.withColumn("score", F.round("score", 9)), k=TOPK).select(
        "query_id", "doc_id", "rank"
    )


def q_eval_sig_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    qt = _qterms(spark)
    qrels = _qrels(spark, sf_dir)
    ap_a = per_query_metrics(
        _ranked(score_bm25(idx, qt, k1=K1, b=B)), qrels, k=TOPK
    ).select("query_id", "ap")
    ap_b = per_query_metrics(_ranked(score_tfidf(idx, qt)), qrels, k=TOPK).select(
        "query_id", "ap"
    )
    return paired_sig_test(ap_a, ap_b, "ap")


def q_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return field_completeness(_raw_records(spark, sf_dir), AUDIT_FIELDS)


def q_phrase_blocked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-positional twin of phrase_docs: same expected rows, but
    computed from the compressed (term, block_key) position blobs via the
    no-join vectorized kernel — the 100 TB phrase plan, gated by the same
    DuckDB oracle as the flat path."""
    from .entry_queries import _docs
    from .entry_queries_ops import PHRASE
    from .index.positional_blocks import build_positional_blocks, phrase_match_blocks

    blocks = build_positional_blocks(_docs(spark, sf_dir))
    return phrase_match_blocks(blocks, list(PHRASE)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("match_count").cast("long").alias("match_count"),
    )


def q_near_blocked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-positional twin of near_docs (same oracle)."""
    from .entry_queries import _docs
    from .entry_queries_ops import NEAR_DIST, NEAR_TERMS
    from .index.positional_blocks import build_positional_blocks, proximity_match_blocks

    blocks = build_positional_blocks(_docs(spark, sf_dir))
    return proximity_match_blocks(blocks, NEAR_TERMS[0], NEAR_TERMS[1], NEAR_DIST).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


def q_window_blocked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-positional twin of window_docs (same oracle)."""
    from .entry_queries import _docs
    from .entry_queries_batch3 import WINDOW_N, WINDOW_TERMS
    from .index.positional_blocks import build_positional_blocks, window_match_blocks

    blocks = build_positional_blocks(_docs(spark, sf_dir))
    return window_match_blocks(blocks, list(WINDOW_TERMS), WINDOW_N).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


PAT_N_MIN, PAT_N_MAX, PAT_MIN_FREQ = 2, 3, 10


def q_mi_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .entry_queries import _docs

    return mi_patterns(
        _docs(spark, sf_dir), n_min=PAT_N_MIN, n_max=PAT_N_MAX, min_freq=PAT_MIN_FREQ
    )


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    ranked = _ranked(score_bm25(idx, _qterms(spark), k1=K1, b=B))
    return interpolated_pr(ranked, _qrels(spark, sf_dir))


# -------------------------------------------------------------- oracles
# shared: per-query AP@TOPK for an arbitrary scored CTE, 5dp-quantized.
# AP evaluates the retrieved list (rank <= TOPK) against the synthetic
# mod-13 qrels — the same algebra the eval_metrics oracle uses.
_SQL_QRELS = f"""
qidx(query_id, qi) AS (VALUES {_QIDX_VALUES}),
qrels AS (
  SELECT qidx.query_id, d.doc_id,
         CASE WHEN d.doc_id % 13 = qidx.qi THEN 2
              WHEN d.doc_id % 13 = qidx.qi + 5 THEN 1
              ELSE 0 END AS rel
  FROM dl d CROSS JOIN qidx
),
qr AS (SELECT * FROM qrels WHERE rel > 0),
totals AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY query_id)
"""


def _sql_ap(scored_cte: str, out: str) -> str:
    """AP@TOPK rows (query_id, ap5) from a (query_id, doc_id, score)
    CTE. The cumulative-hits window is expanded in its own CTE (a
    window can't nest inside an aggregate)."""
    return f"""
rk_{out} AS (SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM {scored_cte}),
j_{out} AS (
  SELECT r.query_id, r.rank,
         CASE WHEN coalesce(qr.rel, 0) > 0 THEN 1 ELSE 0 END AS is_hit
  FROM rk_{out} r LEFT JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
  WHERE r.rank <= {TOPK}
),
jc_{out} AS (
  SELECT query_id, rank, is_hit,
         sum(is_hit) OVER (PARTITION BY query_id ORDER BY rank) AS cum_hits
  FROM j_{out}
),
{out} AS (
  SELECT j.query_id,
         cast(round(sum(j.cum_hits * 1.0 / j.rank * j.is_hit) / t.n_rel * 100000)
              AS BIGINT) AS ap5
  FROM jc_{out} j JOIN totals t USING (query_id)
  GROUP BY j.query_id, t.n_rel
)
"""


ORACLES: dict[str, str] = {}

ORACLES["eval_sig_test"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED.strip().rstrip()},
{_SQL_TFIDF_SCORED.strip()},
{_SQL_QRELS.strip()},
{_sql_ap("scored", "apa").strip()},
{_sql_ap("tscored", "apb").strip()},
d AS (
  SELECT apa.query_id, apa.ap5 AS a5, apb.ap5 AS b5, apa.ap5 - apb.ap5 AS d
  FROM apa JOIN apb USING (query_id)
),
nz AS (
  SELECT d,
         2 * rank() OVER (ORDER BY abs(d))
           + count(*) OVER (PARTITION BY abs(d)) - 1 AS rk_x2
  FROM d WHERE d <> 0
),
wil AS (
  SELECT cast(count(*) AS BIGINT) AS n_nonzero,
         cast(coalesce(sum(CASE WHEN d > 0 THEN rk_x2 END), 0) AS BIGINT) AS w_plus_x2,
         cast(coalesce(sum(CASE WHEN d < 0 THEN rk_x2 END), 0) AS BIGINT) AS w_minus_x2
  FROM nz
),
base AS (
  SELECT cast(count(*) AS BIGINT) AS n_queries,
         cast(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         cast(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS losses,
         cast(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
         sum(a5) AS sa, sum(b5) AS sb, sum(d) AS sd_sum, sum(d * d) AS sd2
  FROM d
)
SELECT n_queries, wins, losses, ties,
       cast(round(sa / cast(n_queries AS DOUBLE)) AS BIGINT) AS mean_a_5dp,
       cast(round(sb / cast(n_queries AS DOUBLE)) AS BIGINT) AS mean_b_5dp,
       cast(round(sd_sum / cast(n_queries AS DOUBLE)) AS BIGINT) AS mean_delta_5dp,
       cast(round(
         CASE WHEN n_queries > 1 AND
                   (sd2 - sd_sum * sd_sum / cast(n_queries AS DOUBLE))
                     / (cast(n_queries AS DOUBLE) - 1.0) > 0
              THEN (sd_sum / cast(n_queries AS DOUBLE))
                   / sqrt(((sd2 - sd_sum * sd_sum / cast(n_queries AS DOUBLE))
                           / (cast(n_queries AS DOUBLE) - 1.0))
                          / cast(n_queries AS DOUBLE))
              ELSE NULL END * 100000) AS BIGINT) AS t_stat_5dp,
       n_nonzero, w_plus_x2, w_minus_x2,
       cast(round(
         CASE WHEN n_nonzero > 0
              THEN (w_plus_x2 / 2.0
                    - cast(n_nonzero AS DOUBLE) * (cast(n_nonzero AS DOUBLE) + 1.0) / 4.0)
                   / sqrt(cast(n_nonzero AS DOUBLE) * (cast(n_nonzero AS DOUBLE) + 1.0)
                          * (2.0 * cast(n_nonzero AS DOUBLE) + 1.0) / 24.0)
              ELSE NULL END * 100000) AS BIGINT) AS wilcoxon_z_5dp
FROM base CROSS JOIN wil
"""

_AUDIT_FIELD_SQL = " UNION ALL ".join(
    f"""
  SELECT '{f}' AS field,
         cast(sum(CASE WHEN {f} IS NULL OR {f} = '' THEN 0 ELSE 1 END) AS BIGINT) AS present,
         cast(sum(CASE WHEN {f} IS NULL OR {f} = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing,
         cast(round(sum(CASE WHEN {f} IS NULL OR {f} = '' THEN 0 ELSE 1 END)
                    / cast(count(*) AS DOUBLE) * 100000) AS BIGINT) AS coverage_5dp,
         CASE WHEN sum(CASE WHEN {f} IS NULL OR {f} = '' THEN 0 ELSE 1 END)
                   / cast(count(*) AS DOUBLE) >= 0.95 THEN 'good'
              WHEN sum(CASE WHEN {f} IS NULL OR {f} = '' THEN 0 ELSE 1 END)
                   / cast(count(*) AS DOUBLE) >= 0.75 THEN 'watch'
              ELSE 'needs_work' END AS status,
         cast(round(sum(length(coalesce({f}, ''))) / cast(count(*) AS DOUBLE) * 100000)
              AS BIGINT) AS mean_len_5dp,
         cast(max(length(coalesce({f}, ''))) AS BIGINT) AS max_len
  FROM raw"""
    for f in AUDIT_FIELDS
)

ORACLES["corpus_audit"] = f"""
WITH {_SQL_RAW.strip()}
{_AUDIT_FIELD_SQL}
"""

ORACLES["pr_curve"] = f"""{_SQL_BASE},
{_SQL_BM25_SCORED.strip()},
{_SQL_QRELS.strip()},
rk AS (SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(score, 9) DESC, doc_id ASC) AS rank
       FROM scored),
j AS (
  SELECT r.query_id, r.rank,
         CASE WHEN coalesce(qr.rel, 0) > 0 THEN 1 ELSE 0 END AS is_hit
  FROM rk r LEFT JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
  WHERE r.rank <= {TOPK}
),
jc AS (
  SELECT j.query_id, j.rank,
         sum(j.is_hit) OVER (PARTITION BY j.query_id ORDER BY j.rank) AS cum_hits,
         t.n_rel
  FROM j JOIN totals t USING (query_id)
),
pr AS (
  SELECT query_id, rank,
         cum_hits * 1.0 / rank AS prec,
         cum_hits * 1.0 / n_rel AS recall
  FROM jc
),
lv AS (SELECT cast(x * 10 AS INT) AS recall_pct FROM generate_series(0, 10) t(x)),
hit AS (
  SELECT pr.query_id, lv.recall_pct, max(pr.prec) AS p_interp
  FROM pr CROSS JOIN lv
  WHERE pr.recall * 100 >= lv.recall_pct
  GROUP BY pr.query_id, lv.recall_pct
),
grid AS (SELECT t.query_id, lv.recall_pct FROM totals t CROSS JOIN lv)
SELECT g.query_id, g.recall_pct,
       cast(round(coalesce(h.p_interp, 0.0) * 100000) AS BIGINT) AS p_interp_5dp
FROM grid g LEFT JOIN hit h
  ON h.query_id = g.query_id AND h.recall_pct = g.recall_pct
"""


_PAT_GRAMS = " UNION ALL ".join(
    f"""
  SELECT unnest(list_transform(generate_series(1, len(tl) - {n} + 1),
         i -> array_to_string(tl[i:i+{n}-1], ' '))) AS pattern, {n} AS n
  FROM ptoks"""
    for n in range(PAT_N_MIN, PAT_N_MAX + 1)
)

ORACLES["mi_patterns"] = f"""
WITH ptoks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tl
  FROM documents
),
uni AS (SELECT unnest(tl) AS term FROM ptoks),
uf AS (SELECT term, count(*) AS uf FROM uni GROUP BY term),
stats AS (SELECT cast(count(*) AS DOUBLE) AS n_tokens FROM uni),
grams AS ({_PAT_GRAMS}),
freq AS (
  SELECT pattern, n, cast(count(*) AS BIGINT) AS freq
  FROM grams GROUP BY pattern, n
  HAVING count(*) >= {PAT_MIN_FREQ}
),
pt AS (
  SELECT f.pattern, f.n, f.freq, unnest(string_split(f.pattern, ' ')) AS term
  FROM freq f
),
sums AS (
  SELECT pattern, n, freq, sum(log2(uf.uf)) AS sum_log_uf
  FROM pt JOIN uf USING (term)
  GROUP BY pattern, n, freq
)
SELECT pattern, cast(n AS INT) AS n, freq,
       cast(round((log2(freq) + (n - 1) * log2(s.n_tokens) - sum_log_uf) * 100000)
            AS BIGINT) AS mi_5dp
FROM sums CROSS JOIN stats s
"""


def _ops_oracle(name: str) -> str:
    from .entry_queries_ops import ORACLES as _OPS_ORACLES

    return _OPS_ORACLES[name]


# the blocked paths are gated by the SAME oracles as the flat paths
ORACLES["phrase_blocked_docs"] = _ops_oracle("phrase_docs")
ORACLES["near_blocked_docs"] = _ops_oracle("near_docs")


def _batch3_oracle(name: str) -> str:
    from .entry_queries_batch3 import ORACLES as _B3_ORACLES

    return _B3_ORACLES[name]


ORACLES["window_blocked_docs"] = _batch3_oracle("window_docs")


def registry() -> dict:
    return {
        "eval_sig_test": q_eval_sig_test,
        "corpus_audit": q_corpus_audit,
        "pr_curve": q_pr_curve,
        "mi_patterns": q_mi_patterns,
        "phrase_blocked_docs": q_phrase_blocked_docs,
        "near_blocked_docs": q_near_blocked_docs,
        "window_blocked_docs": q_window_blocked_docs,
    }
