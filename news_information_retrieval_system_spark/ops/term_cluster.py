"""Term clustering: edit-distance and co-occurrence (SURVEY §2 A6).

Reference: src/ir/cluster/term_cluster.py — edit_distance_clustering
(:334-405, greedy center absorption, order-dependent by its own note),
cooccurrence_clustering (:411-491, bag-of-words pair counts then the
same greedy absorption), edit_distance (:79-142, standard Levenshtein).

Spark split: the O(n²·m) part — pairwise distances / pair counts — runs
distributed (length-bucketed candidate join + JVM ``levenshtein``;
distinct doc-term self-join for co-occurrence). Clustering then runs on
the SPARSE edge list two ways:

* ``*_clusters`` — connected components via ``dedup.dup_components``
  (min-label propagation): order-independent, deterministic, the
  scalable semantics. CC clusters are exactly the transitive closures
  of the reference's "within max_distance of the center" relation —
  the union of greedy clusters that touch.
* ``greedy_absorb`` — the reference's exact sequential semantics over a
  deterministic term order, run driver-side on the collected edge list
  (the edges are sparse; the greedy pass is O(|E|), only the distance
  matrix was ever expensive). Use when reference-exact cluster
  boundaries matter more than order-independence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .dedup import dup_components


def term_vocab(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(term, df) over the whitespace vocabulary — document frequency,
    not collection frequency (distinct per doc before counting)."""
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    ).distinct()
    return dt.groupBy("term").agg(F.count("*").cast("long").alias("df")).filter(
        F.col("df") >= min_df
    )


def edit_distance_pairs(
    terms: DataFrame, max_distance: int = 2, term_col: str = "term"
) -> DataFrame:
    """All term pairs (term_a < term_b) with Levenshtein ≤ max_distance.

    Candidate blocking: |len(a) − len(b)| ≤ max_distance is an exact
    lower bound on edit distance, and it is realized as an EQUI-join —
    side A explodes each term to the length band [len, len+d] and joins
    on B's exact length, so every |Δlen| ≤ d pair meets on exactly one
    bucket key and Catalyst runs a hash join over Σ per-length-band
    products instead of a nested-loop n² (a bare inequality join
    condition would). Distances are JVM ``levenshtein`` (reference
    edit_distance :79-142 is the same DP).
    """
    a = terms.select(
        F.col(term_col).alias("t_a"),
        F.length(term_col).alias("la"),
        F.explode(
            F.sequence(
                F.length(term_col), F.length(term_col) + max_distance
            )
        ).alias("lb"),
    )
    b = terms.select(F.col(term_col).alias("t_b"), F.length(term_col).alias("lb"))
    # each unordered pair meets exactly once: the SHORTER term explodes up
    # into the longer's bucket (la < lb), equal lengths dedup by string
    return (
        a.join(b, "lb")
        .filter(
            (F.col("la") < F.col("lb"))
            | ((F.col("la") == F.col("lb")) & (F.col("t_a") < F.col("t_b")))
        )
        .withColumn("dist", F.levenshtein("t_a", "t_b"))
        .filter(F.col("dist") <= max_distance)
        .select(
            F.least("t_a", "t_b").alias("term_a"),
            F.greatest("t_a", "t_b").alias("term_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


def cooccurrence_pairs(
    docs: DataFrame,
    min_cooccurrence: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term_a < term_b, n_co): number of documents where both appear —
    the reference's bag-of-words co-occurrence counts (:445-460; it
    counts each unordered in-document pair once per document because it
    builds per-document term SETS)."""
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    ).distinct()
    a = dt.select("doc_id", F.col("term").alias("term_a"))
    b = dt.select("doc_id", F.col("term").alias("term_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_cooccurrence)
    )


def _component_labels(terms: DataFrame, pairs: DataFrame) -> DataFrame:
    """(term, cluster): connected components over the pair edges; terms
    with no edge label themselves (singleton clusters). Stays
    distributed — the full-vocabulary labeling can be tens of millions
    of rows; the result is materialized persisted (the one caller-owned
    handle, per the dedup module's _eager_release convention) so the CC
    iteration cache can be released immediately."""
    from .dedup import _eager_release

    labels = dup_components(pairs, a_col="term_a", b_col="term_b")
    out = (
        terms.select("term")
        .join(
            labels.select(
                F.col("doc_id").alias("term"), F.col("component").alias("cluster")
            ),
            "term",
            "left",
        )
        .select("term", F.coalesce("cluster", "term").alias("cluster"))
    )
    return _eager_release(out, labels)


def edit_distance_clusters(
    terms: DataFrame, max_distance: int = 2
) -> DataFrame:
    """(term, cluster) — components of the ≤ max_distance graph, cluster
    labeled by its lexicographically smallest term."""
    return _component_labels(terms, edit_distance_pairs(terms, max_distance))


def cooccurrence_clusters(
    docs: DataFrame,
    min_cooccurrence: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, cluster) — components of the ≥ min_cooccurrence graph."""
    terms = term_vocab(docs, text_col, id_col)
    pairs = cooccurrence_pairs(docs, min_cooccurrence, text_col, id_col)
    return _component_labels(terms, pairs)


def star_similarity_pairs(
    terms: DataFrame, threshold: float = 0.7, term_col: str = "term"
) -> DataFrame:
    """All pairs with normalized-edit similarity ≥ threshold →
    (term_a < term_b, sim), sim = 1 − levenshtein/max(len) (reference
    normalized_edit_distance :144-161 inverted, star_clustering's
    'edit_distance' metric :296-328).

    Blocking: sim ≥ t forces lev ≤ (1−t)·max_len, and with Δlen ≤ lev
    the longer length is ≤ len/t — so the shorter side explodes into
    the bucket band [len .. ⌊len/t⌋] and the join stays an equi-join
    with bounded fan-out (≈ len·(1/t − 1) buckets per term).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    a = terms.select(
        F.col(term_col).alias("t_a"),
        F.length(term_col).alias("la"),
        F.explode(
            F.sequence(
                F.length(term_col),
                F.floor(F.length(term_col) / F.lit(threshold)).cast("int"),
            )
        ).alias("lb"),
    )
    b = terms.select(F.col(term_col).alias("t_b"), F.length(term_col).alias("lb"))
    sim = 1.0 - F.levenshtein("t_a", "t_b") / F.greatest(F.col("la"), F.col("lb"))
    return (
        a.join(b, "lb")
        .filter(
            (F.col("la") < F.col("lb"))
            | ((F.col("la") == F.col("lb")) & (F.col("t_a") < F.col("t_b")))
        )
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(
            F.least("t_a", "t_b").alias("term_a"),
            F.greatest("t_a", "t_b").alias("term_b"),
            "sim",
        )
    )


def star_absorb(
    terms_in_order: list[str], edges: dict, max_terms: int = 200_000
) -> list[tuple[str, list[str]]]:
    """Reference-exact star clustering (term_cluster.py:193-294) over a
    precomputed sparse neighbor map: potentials are computed ONCE up
    front (self counts — similarities[(t,t)] = 1 passes any threshold),
    each round the unclustered term with the highest potential (earliest
    in ``terms_in_order`` on ties, matching the reference's
    strictly-greater scan) becomes a center and absorbs its unclustered
    neighbors in term order. Driver-side O(|V| log |V| + |E|); feed it
    ``star_similarity_pairs(...).collect()`` edges.

    DRIVER-BOUND PARITY OP: this is the reference's own sequential
    absorption order, which no distributed relabeling reproduces —
    ``max_terms`` caps the vocabulary that may be collected. At corpus
    scale use ``edit_distance_clusters`` / ``cooccurrence_clusters``
    (distributed connected-component labeling over the same pair
    frames) and keep this for reference-exact comparisons on bounded
    vocabularies.
    """
    _guard_driver_vocab("star_absorb", len(terms_in_order), max_terms)
    rank = {t: i for i, t in enumerate(terms_in_order)}
    potential = {t: 1 + len(edges.get(t, ())) for t in terms_in_order}
    # centers in (potential desc, input order asc) — a static order, since
    # the reference never recomputes potentials as terms get clustered
    by_potential = sorted(terms_in_order, key=lambda t: (-potential[t], rank[t]))
    return _absorb(by_potential, rank, edges)


def greedy_absorb(
    terms_in_order: list[str], edges: dict, max_terms: int = 200_000
) -> list[tuple[str, list[str]]]:
    """Reference-exact greedy clustering (term_cluster.py:334-405) over a
    precomputed sparse neighbor map: the first unclustered term becomes a
    center and absorbs every still-unclustered neighbor. Pure driver-side
    — O(|E|); feed it ``edit_distance_pairs(...).collect()`` edges.

    ``edges``: {term: set(neighbors within max_distance)}. Returns
    [(center, [cluster terms...])] in center order; members are absorbed
    in ``terms_in_order`` order, exactly like the reference's inner scan,
    but by walking only the center's neighbor set — O(|E| log) overall
    instead of O(|V|²) (a mostly-singleton vocabulary would otherwise
    rescan every term per center).

    DRIVER-BOUND PARITY OP: sequential first-wins center order — see
    ``star_absorb``; at corpus scale use ``edit_distance_clusters`` /
    ``cooccurrence_clusters`` instead.
    """
    _guard_driver_vocab("greedy_absorb", len(terms_in_order), max_terms)
    rank = {t: i for i, t in enumerate(terms_in_order)}
    return _absorb(terms_in_order, rank, edges)


def _guard_driver_vocab(op: str, n: int, max_terms: int) -> None:
    if n > max_terms:
        raise ValueError(
            f"{op} is a driver-side reference-parity loop: {n} terms > "
            f"max_terms={max_terms}. At corpus scale use the distributed "
            "connected-component clusterings (edit_distance_clusters / "
            "cooccurrence_clusters) instead, or raise max_terms knowingly."
        )


def _absorb(
    center_order: list[str], rank: dict, edges: dict
) -> list[tuple[str, list[str]]]:
    """Shared absorption loop: walk candidate centers in ``center_order``,
    each unclustered one absorbs its still-unclustered neighbors in
    ``rank`` (input) order — the only thing greedy vs star vary is the
    center order."""
    clustered: set[str] = set()
    out: list[tuple[str, list[str]]] = []
    for center in center_order:
        if center in clustered:
            continue
        members = [center]
        clustered.add(center)
        for other in sorted(edges.get(center, ()), key=rank.__getitem__):
            if other not in clustered:
                members.append(other)
                clustered.add(other)
        out.append((center, members))
    return out
