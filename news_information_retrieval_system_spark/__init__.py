"""PySpark-native full-text index + BM25 query engine.

A brand-new engine (NOT a port) with the query semantics of the reference
news-IR system (Justin21523/news-information-retrieval-system, read-only at
/root/reference) re-expressed Spark-first: DataFrame/SQL plans, vectorized
Arrow/pandas UDFs where Python is unavoidable, explicit term/doc-range
partitioning, delta+varint compressed posting blocks, and a block-max
DAAT/WAND top-k kernel.

Layout:
    tokenize   — JVM-side regex tokenizer + reference-parity pandas UDF
    corpus     — deterministic distributed synthetic transcript generator
    docids     — stable doc_id assignment under (conv_id, turn_idx) ordering
    index/     — postings + doc_stats build, block codec, resumable segments
    query/     — BM25, WAND, boolean, phrase, VSM, LM, BIM, fuzzy, hybrid
    eval/      — IR metrics (P@k, MAP, MRR, nDCG) as DataFrame ops
    ops/       — dedup (exact/simhash/minhash), ANN similarity, text stats
    oracle     — pure-Python reference scorer for rank-identity tests
"""

__version__ = "0.1.0"
