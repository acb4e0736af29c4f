"""Transcript-table sources: Iceberg when available, parquet otherwise.

The north rule's input is an Iceberg table of conversation turns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. This container ships no Iceberg runtime jar, so every
Iceberg-specific capability is expressed through this seam and degrades to
a documented parquet equivalent:

| Iceberg capability        | engine use                         | parquet fallback |
|---------------------------|------------------------------------|------------------|
| snapshot isolation        | index cache invalidation key       | input dir mtime/content fingerprint |
| MERGE INTO                | incremental postings upsert (B2)   | partition overwrite of affected term buckets |
| hidden partitioning       | `bucket(conv_id)` co-location      | explicit `repartition(n, conv_id)` before write |
| min/max column stats      | ts/date partition pruning (Q12)    | parquet row-group stats (same pruning via Catalyst) |
| table properties          | index manifest (tokenizer, counts) | sidecar lineage.jsonl (segments.build_resumable) |

Everything downstream of ``read_transcripts`` is format-agnostic
DataFrame code, so pointing the engine at a real Iceberg catalog is a
config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "auto",
) -> DataFrame:
    """Load the turns table. ``fmt``: 'iceberg' | 'parquet' | 'auto'
    (iceberg if the runtime is on the classpath and the identifier looks
    like a catalog table, else parquet path)."""
    if fmt == "auto":
        is_table = "/" not in path_or_table
        fmt = "iceberg" if is_table and iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_transcripts(
    df: DataFrame,
    path_or_table: str,
    fmt: str = "auto",
    conv_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist turns co-located by conversation: Iceberg `bucket(conv_id)`
    hidden partitioning, or an explicit repartition for parquet (same
    physical co-location, so per-conversation operators never shuffle)."""
    if fmt == "auto":
        fmt = (
            "iceberg"
            if "/" not in path_or_table and iceberg_available(df.sparkSession)
            else "parquet"
        )
    if fmt == "iceberg":
        writer = df.writeTo(path_or_table).partitionedBy(
            F.bucket(conv_buckets, F.col("conv_id"))
        )
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported mode for Iceberg write: {mode!r}")
        return
    df.repartition(conv_buckets, "conv_id").write.mode(mode).parquet(path_or_table)


def snapshot_fingerprint(spark: SparkSession, path_or_table: str, fmt: str = "auto") -> str:
    """Stable identity of the current table state — Iceberg snapshot id
    when available, else a fingerprint of the parquet file listing. Used
    as the index-cache invalidation key (reference manifest semantics,
    src/ir_app/services/index_service.py:102-218)."""
    if fmt in ("auto", "iceberg") and iceberg_available(spark) and "/" not in path_or_table:
        row = (
            spark.sql(f"SELECT snapshot_id FROM {path_or_table}.snapshots ORDER BY committed_at DESC LIMIT 1")
            .first()
        )
        if row:
            return f"iceberg:{row[0]}"
    import hashlib
    from pathlib import Path

    h = hashlib.sha256()
    for p in sorted(Path(path_or_table).glob("**/*.parquet")):
        st = p.stat()
        h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return f"parquet:{h.hexdigest()[:16]}"
