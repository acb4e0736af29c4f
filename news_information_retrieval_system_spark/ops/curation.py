"""Training-data curation operators (LLM-pipeline face, round 4).

Beyond the reference's own operator set: the operations a large-scale
training-data pipeline runs over a 100 TB document corpus just before
(or instead of) indexing it. All pure Column expressions — no Python in
the hot path — and every plan is a single narrow pass or one broadcast
join, so they compose with the dedup/quality ops at any scale.

* ``split_col`` — deterministic train/val/test assignment by a portable
  content-independent hash bucket (md5 hex prefix). The same record
  lands in the same split on any cluster, any partitioning, any engine
  (the DuckDB oracle recomputes it byte-for-byte) — the property that
  makes dataset splits reproducible across pipeline re-runs.
* ``benchmark_contamination`` — n-gram-overlap decontamination: count,
  per candidate document, the distinct word k-grams it shares with a
  (small) benchmark/holdout set. The benchmark shingle set is broadcast;
  the corpus side is a narrow scan→explode→semi-join — no self-join, no
  shuffle proportional to corpus×benchmark.
* ``pii_email_redact`` — regex PII scrub (emails) with a match count per
  document; one ``regexp_replace`` pass, RE2-compatible pattern so
  independent engines agree.
* ``token_length_buckets`` — power-of-two sequence-length histogram
  (the packing/bucketing statistic a tokenizer-sharding step needs).
* ``pack_sequences`` / ``packing_stats`` — concat-and-chunk context
  packing: global token offsets via a TWO-PASS distributed cumsum
  (range partition → per-partition totals to the driver → prefix
  offset + per-partition window), never a single-partition window.
* ``hash_stratified_sample`` — deterministic mixture-control
  downsampling by salted md5 bucket of the stable id; quantized to
  /256, reproducible on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .dedup import shingles_df

# RE2- and Java-regex-compatible (no backrefs, no lookaround): local part,
# @, dotted domain, 2+ letter TLD. Lowercase classes only — the engine
# normalizes text to lowercase before matching.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


def _hex_threshold(n_buckets: int) -> str:
    """Upper-bound string for a `hex-byte bucket < threshold` compare.
    256 buckets means keep-everything — but format(256,'02x') is '100',
    which sorts BELOW '10'..'ff' lexicographically and would keep almost
    nothing; 'zz' sorts above every hex pair instead."""
    return "zz" if n_buckets >= 256 else format(n_buckets, "02x")


def split_col(id_col: Column | str = "doc_id", train: float = 0.8, val: float = 0.1) -> Column:
    """Deterministic split label from a 256-bucket md5 prefix.

    bucket = first hex byte of md5(cast(id as string)); the two split
    boundaries are hex-string literals, so the comparison is a plain
    lexicographic string compare that DuckDB/Spark/Python all agree on.
    Content-independent (keyed on the stable doc_id), so re-crawling a
    document never migrates it across splits.
    """
    if train < 0 or val < 0 or train + val > 1:
        raise ValueError(f"invalid split fractions train={train} val={val}")
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    n_train = int(round(train * 256))
    n_val = int(round(val * 256))
    b1 = _hex_threshold(n_train)
    b2 = _hex_threshold(n_train + n_val)
    bucket = F.substring(F.md5(col.cast("string")), 1, 2)
    return (
        F.when(bucket < b1, F.lit("train"))
        .when(bucket < b2, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def assign_splits(
    docs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """docs + a ``split`` column (train/val/test)."""
    return docs.withColumn("split", split_col(id_col, train, val))


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_overlap): distinct word k-gram shingles each candidate
    document shares with the benchmark set.

    The benchmark side collapses to a DISTINCT shingle dictionary and is
    broadcast (a benchmark suite is KBs–MBs against a 100 TB corpus), so
    the corpus side never shuffles: scan → tokenize → explode → broadcast
    semi-join → partial-agg count. Candidates already in ``bench`` are
    the caller's business to exclude (they trivially self-overlap).
    """
    doc_sh = shingles_df(docs, text_col=text_col, id_col=id_col, k=k)
    bench_sh = (
        shingles_df(bench, text_col=text_col, id_col=id_col, k=k)
        .select("shingle")
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )


def pii_email_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_emails, redacted): email occurrences counted and
    replaced with ``<EMAIL>`` in one JVM regex pass."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>").alias("redacted"),
    )


def split_leakage(
    docs_with_split: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train/test contamination detector: content groups (by exact text
    hash) that straddle more than one split. Any row here means the same
    document text is visible to training AND evaluation — the leak the
    dedup-before-split ordering exists to prevent. One hash + one
    groupBy; run it as the final gate after split assignment.

    → (content_hash, n_docs, n_splits, min_doc) for straddling groups.
    """
    return (
        docs_with_split.select(
            F.md5(F.col(text_col)).alias("content_hash"),
            F.col("split"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("split").cast("long").alias("n_splits"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        .filter(F.col("n_splits") > 1)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (the duplicate-n-gram
    family of quality filters): total vs distinct bigram counts (their
    difference = repeated-bigram mass) and the most frequent bigram with
    its count (ties broken by lexicographically smallest bigram, so the
    result is deterministic). All integer-exact — consumers derive the
    published ratios (dup fraction, top-bigram fraction) by division, and
    an independent engine reproduces the counts bit-for-bit.

    Plan: explode bigrams → one partial-agg groupBy(doc_id, bigram) →
    per-doc rollup + per-doc top-1 window. Docs with < 2 tokens have no
    bigrams and are absent from the output.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, 2)),
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("n"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("distinct_bigrams"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("bigram"))
    top = (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.col("n").cast("long").alias("top_bigram_n"),
        )
    )
    return agg.join(top, "doc_id").withColumn(
        "dup_bigram_n", (F.col("n_bigrams") - F.col("distinct_bigrams")).cast("long")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Cross-document repeated-span marking — the marking pass of
    exact-substring deduplication (the dedup-literature complement to
    MinHash: remove text that appears verbatim in more than one
    document), approximated at k-gram granularity: a token is
    *duplicated* iff it lies inside at least one k-gram that occurs in
    ≥ 2 distinct documents. Within-doc repetition alone does NOT mark
    (that signal is ``repetition_stats``).

    One row per document containing ≥ 1 duplicated gram:
    ``(doc_id, n_tokens, n_grams, n_dup_grams, dup_tokens)`` — all
    integer-exact. ``dup_tokens`` is the size of the union of the
    length-k intervals starting at each duplicated gram position
    (fixed-length interval union via one lead() window: each start
    covers ``min(next_start − start, k)`` tokens, the last covers k).

    Plan/scale: tokenize → JVM k-gram slide (no Python) →
    (1) duplicated-gram dictionary via two map-side-combinable aggs
    (distinct (gram, doc_id), then groupBy(gram).count) — a hot gram
    reaches the final agg as one row per upstream partition, never one
    per occurrence; (2) occurrence rows re-join the dictionary on gram —
    a 1:1 enrich, NOT a shingle self-join, so there is no pair
    explosion; (3) one doc_id window for the interval union. k ≥ 5
    grams are drastically flatter than unigrams, so the gram-keyed
    shuffles carry no stopword-grade skew.

    ``hash_grams=True`` replaces the gram string with ``xxhash64(gram)``
    BEFORE the shuffles — 8-byte fixed keys instead of ~(6k)-byte
    strings through both exchanges and the join. This is the 100 TB
    configuration; it admits a 2⁻⁶⁴-per-pair false "duplicated" mark on
    hash collision, which is why the oracle-checked default stays exact
    strings (outputs are pytest-pinned identical on real corpora).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    ).filter(F.size("t") >= k)
    gram_of = (
        (lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i + 1, k))))
        if hash_grams
        else (lambda i: F.concat_ws(" ", F.slice("t", i + 1, k)))
    )
    g = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.size("t") - k), gram_of)
        ).alias("pos", "gram"),
    )
    dup = (
        g.select("gram", "doc_id")
        .distinct()
        .groupBy("gram")
        .count()
        .filter(F.col("count") >= 2)
        .select("gram")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = g.join(dup, "gram").withColumn(
        "cover",
        F.least(
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(k)), F.lit(k)
        ),
    )
    return (
        cov.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("long").alias("n_dup_grams"),
            F.sum("cover").cast("long").alias("dup_tokens"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - k + 1).cast("long").alias("n_grams"),
            "n_dup_grams",
            "dup_tokens",
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """The removal pass of exact-substring deduplication: cut every
    cross-document duplicated k-gram span out of the text (the
    complement of ``duplicate_spans``, which only marks). A token is
    removed iff it lies inside at least one k-gram occurring in ≥ 2
    distinct documents — the remaining tokens are re-joined with single
    spaces. Returns one row per input document:
    ``(doc_id, text, n_tokens, n_kept, n_removed)`` with
    ``n_removed`` equal to ``duplicate_spans().dup_tokens`` by
    construction (invariant-tested).

    Plan/scale: shares the marking pass's shape (dictionary via two
    map-side-combinable aggs, 1:1 occurrence enrich — no self-join),
    then compresses the duplicated starts into merged coverage islands
    (gaps-and-islands: one lag window + one groupBy on doc_id — island
    rows ≪ gram rows), collects the few islands per doc into an array,
    and drops covered tokens JVM-side with an index-aware ``filter``
    over the token array (O(n_tokens × n_islands) per doc, no Python).
    The island array per doc is bounded by n_tokens/k, in practice a
    handful — never a per-token join.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    )
    big = toks.filter(F.size("t") >= k)
    gram_of = (
        (lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i + 1, k))))
        if hash_grams
        else (lambda i: F.concat_ws(" ", F.slice("t", i + 1, k)))
    )
    g = big.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.size("t") - k), gram_of)
        ).alias("pos", "gram"),
    )
    dup = (
        g.select("gram", "doc_id")
        .distinct()
        .groupBy("gram")
        .count()
        .filter(F.col("count") >= 2)
        .select("gram")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    starts = g.join(dup, "gram").select("doc_id", "pos")
    # gaps-and-islands over the duplicated starts: a new island begins
    # when the previous start's k-cover cannot reach this one.
    islands = (
        starts.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0),
        )
        .withColumn("isl", F.sum("brk").over(w))
        .groupBy("doc_id", "isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("iv"))
    )
    kept = F.filter(
        "t",
        lambda tok, i: ~F.exists(
            "iv", lambda x: (i >= x["s"]) & (i < x["e"])
        ),
    )
    return (
        toks.join(islands, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("iv").isNull(), F.col("t"))
            .otherwise(kept)
            .alias("kept"),
            F.size("t").alias("n_tokens"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", "kept").alias(text_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.size("kept").cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.size("kept")).cast("long").alias("n_removed"),
        )
    )


def token_length_buckets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(bucket, n_docs, sum_tokens): power-of-two histogram of per-doc
    token counts — bucket = floor(log2(n_tokens)) computed as bit-length
    minus one (base-2 string conv, no float log2: libm rounding of
    log2(2^k) must never move a bucket boundary), empty docs in bucket
    -1. One narrow pass + a 64-row aggregate."""
    n = F.size(tokens_col(text_col))
    bucket = F.when(n > 0, F.length(F.conv(n, 10, 2)) - 1).otherwise(F.lit(-1))
    return (
        docs.select(bucket.cast("long").alias("bucket"), n.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    num_ranges: int | None = None,
) -> DataFrame:
    """Concat-and-chunk context packing: lay every document's tokens
    (plus ``sep_tokens`` separator tokens, e.g. one EOS) end-to-end in
    stable ``id_col`` order and cut fixed ``seq_len``-token training
    examples. Returns the per-document placement map →
    (doc_id, n_tokens, start_token, first_example, last_example,
    n_examples_spanned) — what a pretraining dataloader shard needs to
    materialize example i without scanning its neighbours.

    Scale shape — the global running sum is TWO PASSES, never a
    single-partition window: range-partition + sort by id (ONE
    exchange), take per-partition token totals to the driver (one row
    per partition, bounded by the partition count, not the corpus),
    then a NARROW Arrow-batched cumulative-sum pass that seeds each
    partition with its prefix offset. RangePartitioner assigns
    ascending key ranges to ascending partition ids, so offset(p) =
    Σ totals of partitions < p is the exact global prefix. The
    alternative — a window over spark_partition_id() — would cost a
    SECOND full-table exchange (Catalyst can't know each partition
    already holds exactly one pid), ~24 bytes × corpus rows of extra
    shuffle at 10^12 turns; the mapInPandas pass is shuffle-free and
    vectorized (numpy cumsum per batch, a scalar carried across
    batches). The partitioned frame is localCheckpoint(eager)-ed first
    so the totals job and the cumsum job read the SAME materialized
    boundaries (repartitionByRange re-samples per execution otherwise —
    the docids.py boundary-drift lesson).

    Integer arithmetic only: int64 throughout, floor-division for
    example ids — no float floor at 10^14-token offsets.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from .textstats import token_count_col

    n = (token_count_col(F.col(text_col)) + F.lit(sep_tokens)).cast("long")
    ranges = num_ranges or docs.sparkSession.sparkContext.defaultParallelism
    p = (
        docs.select(F.col(id_col).alias("doc_id"), n.alias("n_tokens"))
        .repartitionByRange(ranges, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted(
        (r["pid"], r["tot"])
        for r in p.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    offsets, acc = {}, 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot

    def cumsum_place(batches):
        import numpy as np
        import pandas as pd

        run = None  # tokens laid down before this row, within + before pid
        for b in batches:
            if len(b) == 0:
                continue
            if run is None:
                run = offsets[int(b["pid"].iloc[0])]
            nn = b["n_tokens"].to_numpy(dtype="int64")
            cum = run + np.cumsum(nn)
            run = int(cum[-1])
            start = cum - nn
            first = start // seq_len
            last = (cum - 1) // seq_len
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy(dtype="int64"),
                    "n_tokens": nn,
                    "start_token": start,
                    "first_example": first,
                    "last_example": last,
                    "n_examples_spanned": last - first + 1,
                }
            )

    schema = (
        "doc_id long, n_tokens long, start_token long, "
        "first_example long, last_example long, n_examples_spanned long"
    )
    return p.mapInPandas(cumsum_place, schema)


def packing_stats(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
) -> DataFrame:
    """One-row packing summary for a corpus at ``seq_len``:
    (n_docs, total_tokens, n_examples, n_docs_spanning, last_fill) —
    n_examples = ceil(total/seq_len); n_docs_spanning counts documents
    cut by an example boundary (the attention-mask-reset workload);
    last_fill = tokens in the final partial example."""
    placed = pack_sequences(
        docs, seq_len, text_col=text_col, id_col=id_col, sep_tokens=sep_tokens
    )
    return placed.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(f"(sum(n_tokens) + {seq_len} - 1) div {seq_len}")
        .cast("long").alias("n_examples"),
        F.sum((F.col("n_examples_spanned") > 1).cast("long"))
        .cast("long").alias("n_docs_spanning"),
        F.expr(f"case when sum(n_tokens) % {seq_len} = 0 then {seq_len} "
               f"else sum(n_tokens) % {seq_len} end")
        .cast("long").alias("last_fill"),
    )


def hash_stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "samp",
) -> DataFrame:
    """Deterministic mixture-control downsampling: keep each row with
    probability ``rates[key]`` (``default_rate`` for unlisted keys),
    decided by a salted 256-bucket md5 hash of the stable id — the same
    row survives on any cluster/partitioning/engine, and re-runs are
    reproducible. The ``salt`` decorrelates the decision from the
    split_col bucket (both hash the id). Rates are quantized to /256
    buckets — exactly reproducible, documented granularity.

    One narrow pass, no shuffle: the op a pipeline uses to hit a target
    domain/language mixture before packing.
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate out of [0,1] for {k!r}: {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    return docs.filter(_sample_keep_expr(rates, key_col, id_col, default_rate, salt))


def _sample_keep_expr(
    rates: dict[str, float],
    key_col: str,
    id_col: str,
    default_rate: float,
    salt: str,
) -> Column:
    """Boolean keep decision for the quantized salted-md5 sampler (shared
    by hash_stratified_sample and temperature_mix)."""
    bucket = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 2
    )
    thr = F.lit(_hex_threshold(int(round(default_rate * 256))))
    for k, r in rates.items():
        thr = F.when(
            F.col(key_col) == k, _hex_threshold(int(round(r * 256)))
        ).otherwise(thr)
    return bucket < thr


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tmix",
    mark_only: bool = False,
) -> tuple[DataFrame, dict[str, float]]:
    """Temperature-based source resampling (the Pile/DoReMi mixing rule):
    target mixture share w_s ∝ n_s^alpha, achieved with MAXIMAL data
    retention by keeping source ``s`` at rate (n_s/n_min)^(alpha-1) — the
    smallest source keeps everything, larger sources are downsampled
    toward the tempered share. alpha=1 keeps natural proportions (all
    rates 1.0); alpha→0 approaches uniform shares.

    → (df, rates): ``df`` filtered to survivors (or kept-flagged when
    ``mark_only`` — the accounting face), ``rates`` the per-source keep
    rates actually applied (pre-quantization; the decision itself uses
    the /256-quantized salted-md5 sampler, deterministic on any engine).

    Plan/scale: ONE tiny groupBy collect (|sources| rows on the driver)
    to derive rates, then one narrow hash-filter pass over the corpus —
    no shuffle, no skew (the decision hashes the id, not the key).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    counts = {
        r[key_col]: r["n"]
        for r in docs.groupBy(key_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return (docs.withColumn("kept", F.lit(1)) if mark_only else docs), {}
    n_min = min(counts.values())
    rates = {k: (n / n_min) ** (alpha - 1.0) for k, n in counts.items()}
    keep = _sample_keep_expr(rates, key_col, id_col, 1.0, salt)
    if mark_only:
        return docs.withColumn("kept", keep.cast("int")), rates
    return docs.filter(keep), rates


_HEXDIGITS = "0123456789abcdef"


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training-order shuffle — the standard step
    between curation and packing: every row gets a pseudo-random but
    exactly reproducible position ``(shard, pos)``; consumers stream
    shards in pos order for a decorrelated training stream that is
    byte-identical on any cluster size, partitioning, or engine.

    shard = salted-md5 256-bucket index mod ``n_shards`` (the same /256
    quantization convention as ``hash_stratified_sample`` — bucket index
    derived with instr() over the hex alphabet, so an independent SQL
    engine reproduces it without hex→int casts); pos = rank of the full
    salted hash within the shard (the unique id embedded in the hash
    input plus an id tiebreak make ties impossible).

    Plan/scale: one narrow hash projection + ONE shard-keyed exchange
    with a within-shard sort — the minimal physical cost of any global
    shuffle. The md5 key is uniform, so shards are balanced by
    construction; ``n_shards`` is the caller's partition-sizing dial
    (corpus_bytes / n_shards ≈ target file size).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # SQL instr() so both operands can be expressions — identical spelling
    # in DuckDB (instr == strpos, 1-based)
    bucket = F.expr(
        f"(instr('{_HEXDIGITS}', substring(sort_key, 1, 1)) - 1) * 16"
        f" + (instr('{_HEXDIGITS}', substring(sort_key, 2, 1)) - 1)"
    )
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"), key.alias("sort_key"))
        .withColumn("shard", (bucket % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def perplexity_flags(
    docs: DataFrame,
    max_perplexity: float,
    lm_train: DataFrame | None = None,
    n: int = 2,
    add_k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style LM quality signal: score every document's perplexity
    under an add-k n-gram LM trained on ``lm_train`` (default: the corpus
    itself) and flag documents above ``max_perplexity`` — the
    out-of-distribution tail a curation pipeline drops or down-weights.

    → (doc_id, n_grams, perplexity, flagged). The threshold compare uses
    the 5-decimal fixed-point value, so two engines that agree on the
    rounded perplexity agree on the flag (no raw-double boundary drift).

    Scale shape is ngram_lm_logprob's: ONE training aggregation (context
    marginal reuses the n-gram shuffle via ReuseExchange), eval side
    joins on (ctx, w) — both sides token-shaped, no corpus self-join.
    """
    from .collocation import ngram_lm_logprob

    train = lm_train if lm_train is not None else docs
    scored = ngram_lm_logprob(
        train, docs, n=n, add_k=add_k
    ) if (text_col, id_col) == ("text", "doc_id") else ngram_lm_logprob(
        train.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        n=n, add_k=add_k,
    )
    ppx5 = F.round(F.col("perplexity") * 100000).cast("long")
    return scored.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("perplexity").alias("perplexity"),
        (ppx5 > int(round(max_perplexity * 100000))).alias("flagged"),
    )


def example_map(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    num_ranges: int | None = None,
) -> DataFrame:
    """The inverse of ``pack_sequences``' placement map: one row per
    (example, document) overlap → (example_id, doc_id, off_in_doc,
    n_in_example). This is what a dataloader shard reads to materialize
    example i: the doc slices that fill it, in order. Row count =
    n_docs + (n_examples − 1) boundary crossings, not docs × examples.

    Invariant (tested): per-example token sums equal ``seq_len`` for
    every example but the last partial one. Plan: the placement pass,
    then a row-local explode of each doc's [first_example, last_example]
    span with integer slice arithmetic — narrow on top of the packing
    plan's one exchange.
    """
    placed = pack_sequences(
        docs, seq_len, text_col=text_col, id_col=id_col,
        sep_tokens=sep_tokens, num_ranges=num_ranges,
    )
    e = F.col("example_id")
    off = F.greatest(F.lit(0), e * seq_len - F.col("start_token"))
    end = F.least(F.col("n_tokens"), (e + 1) * seq_len - F.col("start_token"))
    return (
        placed.select(
            "doc_id", "n_tokens", "start_token",
            F.explode(
                F.sequence(F.col("first_example"), F.col("last_example"))
            ).alias("example_id"),
        )
        .select(
            "example_id",
            "doc_id",
            off.cast("long").alias("off_in_doc"),
            (end - off).cast("long").alias("n_in_example"),
        )
    )
