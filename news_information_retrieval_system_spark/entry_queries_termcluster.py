"""Driver-contract entries for term clustering (A6 remaining members).

Reference parity targets: term_cluster.py edit_distance_clustering
(:334-405) and cooccurrence_clustering (:411-491). The distributed
pairwise stage is checked directly (`editdist_pairs`, `cooc_pairs`), and
the cluster labelings (`term_clusters_*`) are connected components of
those edge graphs — order-independent semantics (see ops/term_cluster.py
docstring; the reference's order-dependent greedy variant is
`greedy_absorb`, pinned by pytest against the reference docstring
example). Oracles recompute the edges with DuckDB `levenshtein` /
distinct doc-term self-joins, and the components with a recursive-CTE
transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _docs

EDIT_MAX_DIST = 2
COOC_MIN = 334  # picked against the sf0.01 distribution: 5 edges incl. a
# 5-term transitive component, so the CC oracle checks real merging

_TOKS = """
toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
vocab AS (SELECT DISTINCT term FROM toks)
"""

_EDIT_EDGES = f"""
tp AS (
  SELECT a.term AS term_a, b.term AS term_b, levenshtein(a.term, b.term) AS dist
  FROM vocab a JOIN vocab b ON a.term < b.term
  WHERE levenshtein(a.term, b.term) <= {EDIT_MAX_DIST}
)
"""

_COOC_EDGES = f"""
dt AS (SELECT DISTINCT doc_id, term FROM toks),
tp AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_co
  FROM dt a JOIN dt b USING (doc_id)
  WHERE a.term < b.term
  GROUP BY 1, 2
  HAVING count(*) >= {COOC_MIN}
)
"""

# transitive closure over tp + singleton terms labeled by themselves
_CLOSURE = """
edges AS (
  SELECT term_a AS s, term_b AS d FROM tp
  UNION ALL
  SELECT term_b, term_a FROM tp
),
reach AS (
  SELECT term AS node, term AS r FROM vocab
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
)
SELECT node AS term, min(r) AS cluster FROM reach GROUP BY node
"""


STAR_T = 0.5  # normalized-edit similarity floor; at sf0.01 yields 5 pairs
# incl. a 4-term star around 'part', so potentials/absorption are exercised


def q_star_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star clustering's similarity graph (normalized-edit ≥ threshold);
    the sequential star absorption itself is driver-side (reference
    :193-294) and pinned by pytest — the distributed, expensive stage is
    what this entry hash-verifies."""
    from .ops.term_cluster import star_similarity_pairs, term_vocab

    terms = term_vocab(_docs(spark, sf_dir))
    out = star_similarity_pairs(terms, threshold=STAR_T)
    return out.select(
        "term_a",
        "term_b",
        F.round(F.col("sim") * 100000).cast("long").alias("sim_5dp"),
    )


def q_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.term_cluster import edit_distance_pairs, term_vocab

    terms = term_vocab(_docs(spark, sf_dir))
    return edit_distance_pairs(terms, max_distance=EDIT_MAX_DIST)


def q_term_clusters_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.term_cluster import edit_distance_clusters, term_vocab

    terms = term_vocab(_docs(spark, sf_dir))
    return edit_distance_clusters(terms, max_distance=EDIT_MAX_DIST)


def q_cooc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.term_cluster import cooccurrence_pairs

    return cooccurrence_pairs(_docs(spark, sf_dir), min_cooccurrence=COOC_MIN)


def q_term_clusters_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.term_cluster import cooccurrence_clusters

    return cooccurrence_clusters(_docs(spark, sf_dir), min_cooccurrence=COOC_MIN)


ORACLES: dict[str, str] = {}

ORACLES["star_pairs"] = f"""
WITH {_TOKS}
SELECT a.term AS term_a, b.term AS term_b,
       CAST(round((1 - levenshtein(a.term, b.term) * 1.0
                       / greatest(len(a.term), len(b.term))) * 100000) AS BIGINT)
         AS sim_5dp
FROM vocab a JOIN vocab b ON a.term < b.term
WHERE 1 - levenshtein(a.term, b.term) * 1.0
          / greatest(len(a.term), len(b.term)) >= {STAR_T}
"""

ORACLES["editdist_pairs"] = f"""
WITH {_TOKS}, {_EDIT_EDGES}
SELECT term_a, term_b, CAST(dist AS BIGINT) AS dist FROM tp
"""

ORACLES["term_clusters_editdist"] = f"""
WITH RECURSIVE {_TOKS}, {_EDIT_EDGES}, {_CLOSURE}
"""

ORACLES["cooc_pairs"] = f"""
WITH {_TOKS}, {_COOC_EDGES}
SELECT term_a, term_b, CAST(n_co AS BIGINT) AS n_co FROM tp
"""

ORACLES["term_clusters_cooc"] = f"""
WITH RECURSIVE {_TOKS}, {_COOC_EDGES}, {_CLOSURE}
"""


def registry():
    return {
        "star_pairs": q_star_pairs,
        "editdist_pairs": q_editdist_pairs,
        "term_clusters_editdist": q_term_clusters_editdist,
        "cooc_pairs": q_cooc_pairs,
        "term_clusters_cooc": q_term_clusters_cooc,
    }
