"""Collaborative-filtering recommenders over the interaction log
(SURVEY §2 A10 — the half the content-based module left open).

Reference: src/ir/recommendation/collaborative_filtering.py —
``compute_user_similarity`` (:187-233, dense user×user cosine),
``recommend_user_based`` (:235-322, similarity-weighted rating
aggregation over the top-n neighbors, consumed items excluded, scores
normalized by the summed similarity), ``compute_item_similarity`` /
``recommend_item_based`` (:324-458, the transposed variant driven by
the target user's own consumed items), and the ALS/SGD matrix
factorization (:460-639). The reference materializes the full dense
similarity matrix with sklearn (O(U²) memory); here every similarity is
the SPARSE co-interaction dot product — a self-join on the shared key —
so pairs that share no item/user are never enumerated.

Spark shape, and why it survives 100 TB:

* The interaction matrix is a tall skinny frame (user_id, doc_key,
  rating) distilled from the raw event log by one partial-aggregating
  groupBy. Ratings are quantized to integer centi-units: every
  downstream dot product and norm is then EXACT integer arithmetic
  (summation order cannot perturb it), and the final cosine is a single
  IEEE divide — bit-identical across engines and partitionings.
* user×user cosine joins the frame with itself on ``doc_key``: each
  item contributes |users(item)|² pair rows, so the one scale hazard is
  item popularity skew — the standard guard is ``hot_item_cap`` which
  excludes items above a user-count ceiling from the PAIRING step only
  (norms keep every item), exactly like ``related_docs``'s
  ``df_ceiling``. item×item cosine is the transpose (join on user_id,
  ``hot_user_cap``). Default None reproduces the reference exactly.
* The recommenders consume the interaction frame from FOUR plan
  branches (both self-join sides, the norms, the neighbor expansion,
  and the consumed-item anti-join). Persist it before fanning out —
  ``inter = interactions(events).persist()`` — or the raw event log is
  scanned once per branch; the distilled matrix is orders of magnitude
  smaller than a 100 TB log, which is exactly what caching is for.
* Neighbor selection is a rank-over-window top-n per row key
  (WindowGroupLimit pushes the limit below the sort); recommendation
  scoring is one join from the n·|users| neighbor edges back to the
  interaction frame plus a left-anti join to drop already-consumed
  items. No driver-side loops, no dense matrices, no collect.
* Ties are pinned everywhere — (sim desc, counterpart id asc) for
  neighbors, (score desc, doc asc) for recs — where the reference
  inherits np.argsort's unstable order; zero-similarity candidates are
  dropped (the reference emits them with score 0 only when EVERY
  contributing neighbor similarity is 0 — a degenerate top-k tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_EVENT_TYPES = ("click", "view", "purchase")


def interactions(
    events: DataFrame,
    event_types: tuple[str, ...] = DEFAULT_EVENT_TYPES,
    user_col: str = "user_id",
    props_col: str = "props",
    json_key: str = "$.k",
    value_col: str = "value",
) -> DataFrame:
    """→ (user_id, doc_key, rating): the implicit-feedback interaction
    matrix, one row per (user, doc) that co-occurred in a qualifying
    event. ``rating`` = sum of the event values in integer centi-units
    (``round(sum(value)·100)``) — quantizing here makes every dot
    product / squared norm downstream exact integer math, so cosines
    are reproducible bit-for-bit regardless of partitioning.

    The doc identifier lives in the event's JSON props (the driver's
    ``events`` shape), parsed JVM-side only for rows surviving the
    event-type filter — at 100 TB the props blob never leaves the scan
    for non-interaction events."""
    return (
        events.filter(F.col("event_type").isin(*event_types))
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.get_json_object(F.col(props_col), json_key)
            .cast("long")
            .alias("doc_key"),
            F.col(value_col).alias("value"),
        )
        .filter(F.col("doc_key").isNotNull())
        .groupBy("user_id", "doc_key")
        .agg(
            F.round(F.sum("value") * 100)
            .cast("long")
            .alias("rating")
        )
    )


def _cosine_pairs(
    inter: DataFrame, row_key: str, join_key: str, hot_cap: int | None
) -> DataFrame:
    """Sparse cosine over the (row_key × join_key) matrix → (``{row_key}
    _a``, ``{row_key}_b``, sim), both directions, sim > 0 only.

    The self-join on ``join_key`` enumerates exactly the co-interacting
    pairs; ``hot_cap`` drops join-key values with more than that many
    distinct rows from the pairing step only (their ratings still count
    toward the norms), bounding the per-key quadratic fan-out."""
    r = inter.select(
        F.col(row_key).alias("rk"), F.col(join_key).alias("jk"), "rating"
    )
    norms = r.groupBy("rk").agg(
        F.sqrt(F.sum(F.col("rating") * F.col("rating")).cast("double")).alias(
            "nrm"
        )
    )
    pair_r = r
    if hot_cap is not None:
        keep = (
            r.groupBy("jk")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= hot_cap)
            .select("jk")
        )
        pair_r = r.join(F.broadcast(keep), "jk", "left_semi")
    a = pair_r.select(
        F.col("rk").alias("ka"), "jk", F.col("rating").alias("ra")
    )
    b = pair_r.select(
        F.col("rk").alias("kb"), "jk", F.col("rating").alias("rb")
    )
    dots = (
        a.join(b, "jk")
        .filter(F.col("ka") != F.col("kb"))
        .groupBy("ka", "kb")
        .agg(F.sum(F.col("ra") * F.col("rb")).cast("double").alias("dot"))
    )
    na = norms.select(F.col("rk").alias("ka"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("rk").alias("kb"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "ka")
        .join(nb, "kb")
        .select(
            F.col("ka").alias(f"{row_key}_a"),
            F.col("kb").alias(f"{row_key}_b"),
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("sim"),
        )
        .filter(F.col("sim") > 0)
    )


def user_similarities(
    inter: DataFrame, hot_item_cap: int | None = None
) -> DataFrame:
    """→ (user_id_a, user_id_b, sim): user×user cosine over shared docs
    (collaborative_filtering.py:187-233 made sparse). Diagonal excluded,
    both directions present, sim strictly positive."""
    return _cosine_pairs(inter, "user_id", "doc_key", hot_item_cap)


def item_similarities(
    inter: DataFrame, hot_user_cap: int | None = None
) -> DataFrame:
    """→ (doc_key_a, doc_key_b, sim): item×item cosine over shared
    users (collaborative_filtering.py:324-371 made sparse)."""
    return _cosine_pairs(inter, "doc_key", "user_id", hot_user_cap)


def _top_neighbors(
    sims: DataFrame, key_a: str, key_b: str, n: int, min_sim: float
) -> DataFrame:
    w = Window.partitionBy(key_a).orderBy(
        F.desc(F.round("sim", 9)), F.asc(key_b)
    )
    return (
        sims.filter(F.col("sim") >= min_sim)
        .withColumn("nbr_rank", F.row_number().over(w))
        .filter(F.col("nbr_rank") <= n)
        .drop("nbr_rank")
    )


def user_based_recs(
    inter: DataFrame,
    sims: DataFrame | None = None,
    n_neighbors: int = 20,
    k: int = 10,
    min_similarity: float = 0.0,
    hot_item_cap: int | None = None,
) -> DataFrame:
    """→ (user_id, rec_rank, doc_key, score): user-based CF top-k
    (collaborative_filtering.py:235-322). For each user: take the
    ``n_neighbors`` most-similar users (ties: user asc), pool every doc
    they interacted with that the target user has NOT, and score it
    ``Σ sim·rating / Σ sim`` over the neighbors that touched it."""
    if sims is None:
        sims = user_similarities(inter, hot_item_cap=hot_item_cap)
    nbrs = _top_neighbors(sims, "user_id_a", "user_id_b", n_neighbors, min_similarity)
    cand = nbrs.join(
        inter.select(
            F.col("user_id").alias("user_id_b"), "doc_key", "rating"
        ),
        "user_id_b",
    )
    fresh = cand.join(
        inter.select(F.col("user_id").alias("user_id_a"), "doc_key"),
        ["user_id_a", "doc_key"],
        "left_anti",
    )
    return _score_candidates(fresh, "user_id_a", k)


def item_based_recs(
    inter: DataFrame,
    sims: DataFrame | None = None,
    n_neighbors: int = 50,
    k: int = 10,
    min_similarity: float = 0.0,
    hot_user_cap: int | None = None,
) -> DataFrame:
    """→ (user_id, rec_rank, doc_key, score): item-based CF top-k
    (collaborative_filtering.py:373-458). Each of the user's consumed
    items votes for its ``n_neighbors`` most-similar items (ties: item
    asc) with weight ``sim·own_rating``; consumed items are excluded
    and scores normalize by the summed similarity."""
    if sims is None:
        sims = item_similarities(inter, hot_user_cap=hot_user_cap)
    nbrs = _top_neighbors(sims, "doc_key_a", "doc_key_b", n_neighbors, min_similarity)
    cand = inter.select(
        "user_id", F.col("doc_key").alias("doc_key_a"), "rating"
    ).join(nbrs, "doc_key_a")
    fresh = cand.select(
        F.col("user_id").alias("user_id_a"),
        F.col("doc_key_b").alias("doc_key"),
        "rating",
        "sim",
    ).join(
        inter.select(F.col("user_id").alias("user_id_a"), "doc_key"),
        ["user_id_a", "doc_key"],
        "left_anti",
    )
    return _score_candidates(fresh, "user_id_a", k)


def _score_candidates(fresh: DataFrame, user_col: str, k: int) -> DataFrame:
    """Similarity-weighted mean rating per (user, doc), top-k per user.
    Scores round to 9dp before ranking: the Σ over ≤n_neighbors doubles
    is the one place summation order can wiggle the last ulp."""
    scored = fresh.groupBy(
        F.col(user_col).alias("user_id"), "doc_key"
    ).agg(
        F.round(
            F.sum(F.col("sim") * F.col("rating")) / F.sum("sim"), 9
        ).alias("score")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("doc_key")
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= k)
        .select("user_id", "rec_rank", "doc_key", "score")
    )


def als_item_factors(
    inter: DataFrame,
    rank: int = 4,
    max_iter: int = 8,
    reg_param: float = 0.1,
    seed: int = 7,
    blocks: int = 4,
) -> DataFrame:
    """→ (doc_key, pos, weight): item latent factors from
    ``pyspark.ml.recommendation.ALS`` — the distributed counterpart of
    the reference's driver-side ALS loop (collaborative_filtering.py:
    460-639, R ≈ U·Vᵀ with L2 regularization). Block counts and the
    input partitioning are pinned so the seeded factor init (and hence
    the converged factors) is reproducible run-to-run; the registry
    gates this with a pinned-VALUES drift check, like ``lda_topics``.

    Uses implicit centi-ratings rescaled back to value units."""
    from pyspark.ml.recommendation import ALS

    ratings = inter.select(
        F.col("user_id").cast("int").alias("user"),
        F.col("doc_key").cast("int").alias("item"),
        (F.col("rating") / 100.0).cast("float").alias("rating"),
    ).coalesce(1)
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        numUserBlocks=blocks,
        numItemBlocks=blocks,
        coldStartStrategy="drop",
        userCol="user",
        itemCol="item",
        ratingCol="rating",
    )
    model = als.fit(ratings)
    return model.itemFactors.select(
        F.col("id").cast("long").alias("doc_key"),
        F.posexplode("features").alias("pos", "weight"),
    ).select(
        "doc_key", F.col("pos").cast("long").alias("pos"), "weight"
    )
