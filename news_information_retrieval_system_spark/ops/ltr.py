"""Learning-to-rank sandbox: weak-supervision feature export + logistic
training (SURVEY §2 A12).

Reference semantics:
* Feature export — src/ir_app/services/learning_to_rank_feature_service.py
  :140-197: one row per (query, doc) candidate with query_term_count,
  per-field match counts, and the diagnostic model scores (bm25/tfidf/lm,
  :199-215 pulls them from ranking diagnostics); weak label :217-227 —
  explicit grade/3 when present, else clicked=1 / impression=0.
* Training — learning_to_rank_training_service.py:38-122: standardize
  features, sklearn LogisticRegression(class_weight="balanced"), report
  coefficients sorted by |coef| plus training accuracy.

Spark shape (this engine has no click log; the transcripts/documents
tables are the only inputs):
* Candidates are each query's BM25 top-``k_cand`` (exactly the
  reference's ``_rows_from_search_event`` impression expansion — search
  top-results become candidate rows). The weak label is the
  deterministic click surrogate ``every query term appears ≥ click_tf
  times in the doc`` — correlated with, but not separable by, any
  single model score, so the logistic fit is non-degenerate and
  reproducible without a feedback table (``click_tf=1`` ≡ "all query
  terms present"; larger values keep both classes populated when the
  corpus is big enough that every top-k candidate matches all terms).
* All per-pair features come from ONE candidate×query-term expansion
  (query/diagnostics.py model_term_matrix): per-model scores are sums
  of the per-term contributions, match counts are counts over the same
  rows — one postings join total, no per-model scoring passes.
* Training uses pyspark.ml LogisticRegression on driver-standardized
  columns with an explicit balanced ``weight`` column (n/(2·n_class) —
  sklearn's class_weight="balanced") — L-BFGS, deterministic for a
  given dataset.

The documents table is single-field (doc_id, text, ...), so the
reference's title/content/tags/category match quartet collapses to one
``match_count``; the remaining features map 1:1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import FulltextIndex
from ..query.diagnostics import model_term_matrix

FEATURE_COLS = (
    "query_term_count",
    "match_count",
    "dl",
    "bm25_score",
    "tfidf_score",
    "lm_score",
)


def ltr_features(
    index: FulltextIndex,
    qterms: DataFrame,
    k_cand: int = 10,
    click_tf: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    mu: float = 2000.0,
) -> DataFrame:
    """→ (query_id, doc_id, rank, label, query_term_count, match_count,
    dl, bm25_score, tfidf_score, lm_score): one weak-supervision feature
    row per BM25 top-``k_cand`` candidate of each query.

    ``qterms``: (query_id, term[, qtf]). Rank ties break on 9dp-rounded
    score then doc_id ascending (the engine-wide deterministic top-k
    discipline); ``bm25_score`` is re-derived from the same per-term
    matrix the other features use, so Σ bm25_term ≡ the ranking score.
    """
    from ..query.bm25 import score_bm25, topk

    if "qtf" not in qterms.columns:
        qterms = qterms.withColumn("qtf", F.lit(1))
    scored = score_bm25(index, qterms, k1=k1, b=b).withColumn(
        "score", F.round("score", 9)
    )
    cand = topk(scored, k=k_cand).select("query_id", "doc_id", "rank")
    m = model_term_matrix(
        index, qterms, cand.select("query_id", "doc_id"), k1=k1, b=b, mu=mu
    )
    dls = index.doc_stats.select("doc_id", "dl")
    feats = (
        m.groupBy("query_id", "doc_id")
        .agg(
            F.sum("qtf").cast("long").alias("query_term_count"),
            F.count(F.when(F.col("matched"), 1)).cast("long").alias("match_count"),
            F.sum("bm25_term").alias("bm25_score"),
            F.sum("tfidf_term").alias("tfidf_score"),
            F.sum("lm_term").alias("lm_score"),
            F.min("tf").alias("min_tf"),
        )
        .join(dls, "doc_id")
        .join(cand, ["query_id", "doc_id"])
    )
    return feats.select(
        "query_id",
        "doc_id",
        "rank",
        F.when(F.col("min_tf") >= click_tf, 1.0).otherwise(0.0).alias("label"),
        "query_term_count",
        "match_count",
        F.col("dl").cast("long").alias("dl"),
        "bm25_score",
        "tfidf_score",
        "lm_score",
    )


def ltr_train(
    features: DataFrame,
    feature_cols: Sequence[str] = FEATURE_COLS,
    label_col: str = "label",
    reg: float = 0.01,
    max_iter: int = 100,
) -> tuple[DataFrame, dict]:
    """Fit the weak-supervision logistic model. → (coefficients_df,
    report): coefficients_df = (feature, coefficient, direction) in the
    ORIGINAL (unstandardized-interpretation) feature order of
    ``feature_cols`` plus an ``__intercept__`` row; report carries
    row_count, class_balance, and training_accuracy — the reference
    payload's core (learning_to_rank_training_service.py:104-122).

    Features are standardized to zero-mean/unit-variance (population σ,
    sklearn StandardScaler semantics) with the scaler fitted by one tiny
    aggregate; rows are weighted n/(2·n_class) (class_weight="balanced").
    ``reg`` keeps coefficients finite if the weak labels happen to be
    separable. Raises ValueError on <4 rows or a single class, matching
    the reference's INSUFFICIENT_ROWS / SINGLE_CLASS refusals (:55-68).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    spark = features.sparkSession
    cols = list(feature_cols)
    stats_row = features.agg(
        F.count("*").alias("n"),
        F.sum(F.col(label_col)).alias("n_pos"),
        *[F.avg(c).alias(f"mu_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"sd_{c}") for c in cols],
    ).first()
    n, n_pos = int(stats_row["n"]), int(stats_row["n_pos"])
    n_neg = n - n_pos
    if n < 4:
        raise ValueError("INSUFFICIENT_ROWS: need >= 4 feature rows")
    if not n_pos or not n_neg:
        raise ValueError("SINGLE_CLASS: need both weak-label classes")
    std = [
        (
            (F.col(c) - float(stats_row[f"mu_{c}"]))
            / (float(stats_row[f"sd_{c}"]) or 1.0)
        ).alias(f"z_{c}")
        for c in cols
    ]
    w = F.when(F.col(label_col) >= 0.5, n / (2.0 * n_pos)).otherwise(
        n / (2.0 * n_neg)
    )
    ds = features.select(
        F.col(label_col).cast("double").alias("y"), w.alias("wt"), *std
    )
    vec = VectorAssembler(
        inputCols=[f"z_{c}" for c in cols], outputCol="fvec"
    ).transform(ds)
    lr = LogisticRegression(
        featuresCol="fvec",
        labelCol="y",
        weightCol="wt",
        regParam=reg,
        standardization=False,
        maxIter=max_iter,
        tol=1e-10,
    )
    model = lr.fit(vec)
    acc = (
        model.transform(vec)
        .select(
            F.avg((F.col("prediction") == F.col("y")).cast("double")).alias("a")
        )
        .first()["a"]
    )
    rows = [(c, float(v)) for c, v in zip(cols, model.coefficients)]
    rows.append(("__intercept__", float(model.intercept)))
    coefs = spark.createDataFrame(
        rows, "feature string, coefficient double"
    ).withColumn(
        "direction",
        F.when(F.col("coefficient") >= 0, "positive").otherwise("negative"),
    )
    report = {
        "row_count": n,
        "class_balance": {0: n_neg, 1: n_pos},
        "training_accuracy": round(float(acc), 6),
    }
    return coefs, report
