"""Hybrid recommender: weighted fusion of content-based, collaborative,
and popularity signals (SURVEY §2 A10 — the composition layer).

Reference: src/ir/recommendation/hybrid_recommender.py —
``compute_popularity`` (:140-160, per-item interaction share),
``recommend_weighted`` (:166-293: candidate union over the content and
CF recommenders' top-3k pools, per-source score normalization, final =
w_c·content + w_cf·cf + w_p·popularity, sort desc). The reference's
``_normalize_score`` with its default (0, 1) range is the identity
(:572-577); here each source normalizes by the user's per-source
maximum instead, which is what makes a cosine (≤1) and a CF
mean-rating (unbounded) actually commensurable — the documented intent
("Normalize scores to [0, 1]") rather than the literal no-op.

Spark shape: every stage is a join/groupBy over the (user, doc) grain —
the candidate union is one full-outer join of the two recommenders'
outputs, per-user maxima are window aggregates, popularity is a
broadcast-joined per-item dim, and the final top-k is a
WindowGroupLimit rank. Nothing materializes a per-user Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_popularity(inter: DataFrame) -> DataFrame:
    """→ (doc_key, popularity): the share of users who interacted with
    the item (hybrid_recommender.py:140-160) — already in [0, 1]."""
    totals = inter.agg(
        F.countDistinct("user_id").cast("double").alias("n_users")
    )
    per_item = inter.groupBy("doc_key").agg(
        F.countDistinct("user_id").cast("double").alias("n_item_users")
    )
    return per_item.join(F.broadcast(totals)).select(
        "doc_key",
        (F.col("n_item_users") / F.col("n_users")).alias("popularity"),
    )


def content_scores(inter: DataFrame, weights: DataFrame) -> DataFrame:
    """→ (user_id, doc_key, content_score): reading-history content
    personalization (hybrid_recommender.py:195-214 via the content
    recommender's ``recommend_personalized``) — each candidate doc
    scores the MEAN TF-IDF cosine to the user's consumed docs, consumed
    docs excluded. ``weights`` is the L2-normalized (term, doc_id,
    w_norm) frame (``query.vsm.build_tfidf_weights``).

    Scale shape: the pair scan is seed-bounded — only docs somebody
    consumed sit on the seed side of the term join — and the per-pair
    cosine is the sparse normalized dot product, so cost tracks the
    catalog's co-term structure, not |users|."""
    seeds = inter.select(F.col("doc_key").alias("doc_id")).distinct()
    ws = weights.join(F.broadcast(seeds), "doc_id", "left_semi").select(
        F.col("doc_id").alias("seed_id"), "term", F.col("w_norm").alias("w_s")
    )
    wo = weights.select(
        F.col("doc_id").alias("cand_id"), "term", F.col("w_norm").alias("w_o")
    )
    pairs = (
        ws.join(wo, "term")
        .filter(F.col("seed_id") != F.col("cand_id"))
        .groupBy("seed_id", "cand_id")
        .agg(F.round(F.sum(F.col("w_s") * F.col("w_o")), 9).alias("cosine"))
    )
    per_user = (
        inter.select("user_id", F.col("doc_key").alias("seed_id"))
        .join(pairs, "seed_id")
        .groupBy("user_id", F.col("cand_id").alias("doc_key"))
        .agg(F.round(F.avg("cosine"), 9).alias("content_score"))
    )
    return per_user.join(
        inter.select("user_id", "doc_key"), ["user_id", "doc_key"], "left_anti"
    )


def cf_mean_item_sims(inter: DataFrame, item_sims: DataFrame) -> DataFrame:
    """→ (user_id, doc_key, cf_score): the cascade's stage-2 CF signal
    (hybrid_recommender.py:334-351) — for each candidate item, the MEAN
    item-similarity to the user's consumed items. The reference means
    over the dense row (absent pairs contribute 0), so the denominator
    is the user's FULL item count, not the co-similar subset."""
    n_items = inter.groupBy("user_id").agg(F.count("*").alias("n_items"))
    summed = (
        inter.select("user_id", F.col("doc_key").alias("doc_key_b"))
        .join(item_sims, "doc_key_b")
        .groupBy("user_id", F.col("doc_key_a").alias("doc_key"))
        .agg(F.sum("sim").alias("ssum"))
    )
    return summed.join(n_items, "user_id").select(
        "user_id",
        "doc_key",
        F.round(F.col("ssum") / F.col("n_items"), 9).alias("cf_score"),
    )


def cascade_recs(
    content: DataFrame,
    cf_mean: DataFrame,
    popularity: DataFrame,
    pool: int = 50,
    k: int = 10,
) -> DataFrame:
    """→ (user_id, rec_rank, doc_key, score): cascade fusion
    (hybrid_recommender.py:294-390) — content-based generates the
    recall pool (top-``pool`` per user), the CF mean-similarity
    re-ranks it, popularity breaks in as a small additive term:
    ``0.7·cf + 0.2·content + 0.1·pop`` when the candidate has CF
    evidence, else ``0.8·content + 0.2·pop`` (the reference's raw-score
    cascade weights)."""
    wp = Window.partitionBy("user_id").orderBy(
        F.desc("content_score"), F.asc("doc_key")
    )
    cand = (
        content.withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= pool)
        .drop("prank")
    )
    j = (
        cand.join(cf_mean, ["user_id", "doc_key"], "left")
        .join(F.broadcast(popularity), "doc_key", "left")
        .withColumn("cf", F.coalesce("cf_score", F.lit(0.0)))
        .withColumn("pop", F.coalesce("popularity", F.lit(0.0)))
    )
    score = F.when(
        F.col("cf") > 0,
        F.lit(0.7) * F.col("cf")
        + F.lit(0.2) * F.col("content_score")
        + F.lit(0.1) * F.col("pop"),
    ).otherwise(
        F.lit(0.8) * F.col("content_score") + F.lit(0.2) * F.col("pop")
    )
    out = j.withColumn("score", F.round(score, 9))
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("doc_key")
    )
    return (
        out.withColumn("rec_rank", F.row_number().over(wr))
        .filter(F.col("rec_rank") <= k)
        .select("user_id", "rec_rank", "doc_key", "score")
    )


def switching_recs(
    inter: DataFrame,
    cf_recs: DataFrame,
    content: DataFrame,
    popularity: DataFrame,
    min_cf_interactions: int = 5,
    k: int = 10,
) -> DataFrame:
    """→ (user_id, rec_rank, doc_key, score, method): switching fusion
    (hybrid_recommender.py:391-528) — users with ≥``min_cf_interactions``
    interactions get pure item-CF; users with fewer get content
    re-weighted by popularity (``0.7·content + 0.3·pop``). The
    reference switches per request; here ONE pass tags every user with
    their method and the two branches union — no per-user dispatch."""
    counts = inter.groupBy("user_id").agg(F.count("*").alias("n_inter"))
    cf_users = counts.filter(
        F.col("n_inter") >= min_cf_interactions
    ).select("user_id")
    cf_branch = cf_recs.join(
        F.broadcast(cf_users), "user_id", "left_semi"
    ).select(
        "user_id",
        "doc_key",
        F.col("score").alias("raw"),
        F.lit("cf").alias("method"),
    )
    content_branch = (
        content.join(F.broadcast(cf_users), "user_id", "left_anti")
        .join(F.broadcast(popularity), "doc_key", "left")
        .select(
            "user_id",
            "doc_key",
            (
                F.lit(0.7) * F.col("content_score")
                + F.lit(0.3) * F.coalesce("popularity", F.lit(0.0))
            ).alias("raw"),
            F.lit("content_pop").alias("method"),
        )
    )
    merged = cf_branch.unionByName(content_branch).withColumn(
        "score", F.round("raw", 9)
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("doc_key")
    )
    return (
        merged.withColumn("rec_rank", F.row_number().over(wr))
        .filter(F.col("rec_rank") <= k)
        .select("user_id", "rec_rank", "doc_key", "score", "method")
    )


def hybrid_weighted(
    cf_recs: DataFrame,
    content: DataFrame,
    popularity: DataFrame,
    w_content: float = 0.4,
    w_cf: float = 0.4,
    w_pop: float = 0.2,
    k: int = 10,
) -> DataFrame:
    """→ (user_id, rec_rank, doc_key, score): the weighted fusion.
    ``cf_recs`` carries (user_id, doc_key, score); ``content`` carries
    (user_id, doc_key, content_score). Candidates = the union of both
    pools (full-outer join, absent source contributes 0); each source
    is normalized by the user's per-source maximum; popularity joins as
    a per-item dim. Ties: score desc, doc_key asc."""
    c = content.select(
        "user_id", "doc_key", F.col("content_score").alias("cs")
    )
    f = cf_recs.select("user_id", "doc_key", F.col("score").alias("fs"))
    merged = (
        c.join(f, ["user_id", "doc_key"], "full_outer")
        .withColumn("cs", F.coalesce("cs", F.lit(0.0)))
        .withColumn("fs", F.coalesce("fs", F.lit(0.0)))
    )
    wu = Window.partitionBy("user_id")
    merged = merged.withColumn("mc", F.max("cs").over(wu)).withColumn(
        "mf", F.max("fs").over(wu)
    )
    norm_c = F.when(F.col("mc") > 0, F.col("cs") / F.col("mc")).otherwise(
        F.lit(0.0)
    )
    norm_f = F.when(F.col("mf") > 0, F.col("fs") / F.col("mf")).otherwise(
        F.lit(0.0)
    )
    blended = (
        merged.join(F.broadcast(popularity), "doc_key", "left")
        .withColumn(
            "score",
            F.round(
                F.lit(w_content) * norm_c
                + F.lit(w_cf) * norm_f
                + F.lit(w_pop) * F.coalesce("popularity", F.lit(0.0)),
                9,
            ),
        )
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("doc_key")
    )
    return (
        blended.withColumn("rec_rank", F.row_number().over(wr))
        .filter(F.col("rec_rank") <= k)
        .select("user_id", "rec_rank", "doc_key", "score")
    )
