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
    query/     — BM25, BM25F, WAND, champion lists, boolean, phrase, VSM,
                 LM, SDM, BIM, fuzzy, hybrid
    eval/      — IR metrics (P@k, MAP, MRR, nDCG) as DataFrame ops
    ops/       — dedup (exact/simhash/minhash), ANN similarity, text stats,
                 training-data curation (splits, decontamination, PII,
                 packing, mixture sampling, LM perplexity) + the composed
                 curate_corpus pipeline
    streaming/ — ingest, sessionization, dedup, rollups, stateless curation
    oracle     — pure-Python reference scorer for rank-identity tests
"""

__version__ = "0.1.0"

# --------------------------------------------------------------------------
# Memory-allocator tuning. This runs in the driver AND in every pyspark
# worker (workers import this package when UDF kernels deserialize).
#
# Rationale (measured, scripts/profile_stages.py): on Firecracker-style VMs
# first-touch page faults are ~30x slower than warm-page writes, while glibc
# returns every >128KB buffer to the OS on free — so every large numpy/pandas
# temp re-faults its pages. mallopt'ing the mmap/trim thresholds up makes the
# main arena retain and reuse pages: a measured 38x speedup on alloc+touch
# loops (152ms -> 4ms for an 80MB array), which is exactly the allocation
# pattern of Arrow-batched kernels.
import ctypes as _ctypes
import os as _os

_GLIBC_TUNABLES = (
    "glibc.malloc.mmap_threshold=1073741824:glibc.malloc.trim_threshold=1073741824"
)


def _tune_malloc() -> None:
    try:
        libc = _ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # non-glibc platform — harmless
        pass
    # inherited by any JVM (and its python workers) forked from this process
    _os.environ.setdefault("GLIBC_TUNABLES", _GLIBC_TUNABLES)
    # route pyarrow through the (now tuned) system allocator instead of its
    # bundled jemalloc, which aggressively decays pages back to the OS
    _os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


_tune_malloc()
