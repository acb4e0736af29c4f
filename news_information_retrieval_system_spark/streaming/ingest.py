"""Structured Streaming ingest: continuous document arrival → segment store.

The reference's incremental builder is batch-append
(src/ir/index/incremental_builder.py:180-470: add_documents_batch per
chunk, finalize() re-derives stats); SURVEY §1/§7 map that to
batch-append rather than streaming. This module is the Spark-native
continuation of the same design for CONTINUOUS arrival: a file-source
``readStream`` feeds ``foreachBatch``, and every micro-batch runs the
existing narrow build (``build_index`` → ``build_blocked_postings``) and
lands one compressed SEGMENT under ``out_dir/segments/batch_id=N``.
Query-time hydration merges segments exactly like the batch incremental
path — append ≡ rebuild semantics carry over unchanged.

Scale/correctness shape:

* Each micro-batch build is the shuffle-free scan→tokenize→histogram
  plan; per-batch segment encode shuffles only compressed blocks. A
  1000-executor cluster ingests each micro-batch fully parallel.
* Exactly-once: the file source tracks consumed files in the stream
  checkpoint, and the sink writes each batch to a batch_id-keyed
  directory with mode("overwrite") — a replayed batch after failure
  overwrites its own output instead of duplicating postings.
* Doc ids must arrive ON the stream rows (dense assignment is a global
  operation — the ingest contract gives each producer a doc-id range,
  as the driver testdata does). Stats (df/idf/avgdl) are NOT maintained
  incrementally per micro-batch; they are re-derived at hydration — the
  reference's finalize() discipline, which keeps the streaming sink a
  pure append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.build import build_index
from ..index.segments import (
    DEFAULT_SPAN_BITS,
    build_blocked_postings,
    index_from_blocks,
    merge_segments,
)


def stream_index(
    spark: SparkSession,
    input_path: str,
    schema,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer_mode: str = "fast",
    stopwords=None,
    span_bits: int = DEFAULT_SPAN_BITS,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the ingest stream; returns the StreamingQuery.

    ``available_now=True`` (default) drains everything currently in
    ``input_path`` and stops — the batch-catchup mode; pass False for a
    long-running continuous ingest. ``max_files_per_trigger`` bounds
    micro-batch size (and therefore per-segment size) for steady-state
    latency control.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = build_index(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            tokenizer_mode=tokenizer_mode,
            stopwords=stopwords,
        )
        # the segment encode consumes postings twice (blocks + the
        # term_stats join derives from the same lineage); cache the one
        # scan→tokenize pass instead of re-running it per consumer
        p = idx.postings.persist()
        try:
            seg = build_blocked_postings(
                p, span_bits=span_bits, term_dict=idx.term_stats
            )
            seg.write.mode("overwrite").parquet(
                f"{out_dir}/segments/batch_id={batch_id}"
            )
        finally:
            p.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .queryName("fulltext-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hydrate_stream_index(
    spark: SparkSession,
    out_dir: str,
    docs: DataFrame,
    span_bits: int = DEFAULT_SPAN_BITS,
):
    """Segment store → queryable FulltextIndex (finalize()).

    Reads every streamed segment, merges (term, block_key) fragments that
    straddle micro-batches, and re-derives df/idf/dl/avgdl from the
    merged blocks. ``docs`` is the batch view of the ingested corpus
    (e.g. ``spark.read.parquet(input_path)``) supplying n_docs and
    hydration columns.
    """
    blocks = spark.read.parquet(f"{out_dir}/segments")
    merged = merge_segments(blocks.drop("batch_id"), span_bits=span_bits)
    return index_from_blocks(merged, docs, span_bits=span_bits)
