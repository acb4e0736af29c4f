"""S3 — record normalization + data-contract validation for raw ingestion.

Reference parity: the contract in
/root/reference/src/ir_app/services/data_contract.py:10-128
(MIN_CONTENT_CHARS=20, MIN_TITLE_CHARS=2, REQUIRED_FIELDS={title, content},
validate_article issue codes, compute_dedup_hash = md5(lower(trim(title)) ||
'||' || lower(trim(url))), normalize_tags) and the normalize+dedup pass in
document_service.py:111-199 (_normalize_records: validate → drop invalid →
dedup-by-hash keeping FIRST occurrence → normalize fields, dense doc_id by
kept order).

Spark-first shape: every rule is a pure Column expression — no Python in
the row path — so validation is one narrow projection over the raw scan
(pushdown-friendly, survives 100 TB trivially). Dedup-keep-first and dense
id assignment are each ONE window over the dedup hash / kept order; at
100 TB the window's sort is the same shuffle an aggregation would need, and
the reference's "first occurrence in file order" is well-defined here as
first by the caller-supplied ``order_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_CONTENT_CHARS = 20
MIN_TITLE_CHARS = 2

# issue codes, exactly the reference's (data_contract.py:100-118)
MISSING_TITLE = "MISSING_FIELD:title"
MISSING_CONTENT = "MISSING_FIELD:content"
TITLE_TOO_SHORT = "TITLE_TOO_SHORT"
CONTENT_TOO_SHORT = "CONTENT_TOO_SHORT"
DUPLICATE = "DUPLICATE"

# ------------------------------------------------------------- taxonomy
# Default taxonomy dims mirroring the reference's normalization MECHANISM
# (src/ir_app/services/taxonomy.py:45-83 CATEGORY_ALIASES lookup: exact
# key, then lowercased key, else the unknown bucket; :10-22 TOPIC_LABELS;
# taxonomy_path = '<prefix>/<topic>/<leaf>', :160-183). The reference's
# values are its own news-corpus vocabulary; callers pass their dims.
TOPIC_LABELS: dict[str, str] = {
    "politics": "Politics",
    "business": "Business",
    "tech": "Tech",
    "sports": "Sports",
    "other": "Other",
}

CATEGORY_ALIASES: dict[str, tuple[str, str]] = {
    "politics": ("politics", "politics"),
    "aipl": ("politics", "politics"),
    "business": ("business", "business"),
    "finance": ("business", "finance"),
    "property": ("business", "property"),
    "tech": ("tech", "tech"),
    "gadget": ("tech", "gadget"),
    "ai": ("tech", "ai"),
    "sports": ("sports", "sports"),
    "other": ("other", "other"),
    "unknown": ("other", "unknown"),
    "": ("other", "unknown"),
}


def taxonomy_cols(
    records: DataFrame,
    category_col: str = "category",
    aliases: dict[str, tuple[str, str]] | None = None,
    topic_labels: dict[str, str] | None = None,
    path_prefix: str = "news",
) -> DataFrame:
    """Append ``taxonomy_topic``/``taxonomy_leaf``/``taxonomy_label``/
    ``taxonomy_path`` by normalizing the raw category through the alias
    dim table (taxonomy.py:133-183 classify_category: exact alias hit,
    then lowercased hit, else the unknown bucket).

    Spark shape: the dims are tiny literal tables — two broadcast
    left joins (exact, lowercased) plus one for the topic label. No
    shuffle of the record side, so at 100 TB this rides along inside
    the ingest projection for free."""
    spark = records.sparkSession
    aliases = CATEGORY_ALIASES if aliases is None else aliases
    topic_labels = TOPIC_LABELS if topic_labels is None else topic_labels
    adim = spark.createDataFrame(
        [(k, t, l) for k, (t, l) in aliases.items()],
        "alias string, topic string, leaf string",
    )
    tdim = spark.createDataFrame(
        list(topic_labels.items()), "topic string, label string"
    )
    cat = _trim(F.coalesce(F.col(category_col).cast("string"), F.lit("")))
    r = records.withColumn("_cat", cat).withColumn("_catl", F.lower(cat))
    exact = adim.select(
        F.col("alias").alias("_cat"),
        F.col("topic").alias("_t1"),
        F.col("leaf").alias("_l1"),
    )
    # the lowercased lookup probes the SAME alias keys (the reference
    # checks key then key.lower() against one dict) — no key fan-out
    lowered = adim.select(
        F.col("alias").alias("_catl"),
        F.col("topic").alias("_t2"),
        F.col("leaf").alias("_l2"),
    )
    r = (
        r.join(F.broadcast(exact), "_cat", "left")
        .join(F.broadcast(lowered), "_catl", "left")
        .withColumn(
            "taxonomy_topic", F.coalesce("_t1", "_t2", F.lit("other"))
        )
        .withColumn(
            "taxonomy_leaf", F.coalesce("_l1", "_l2", F.lit("unknown"))
        )
    )
    tl = tdim.select(
        F.col("topic").alias("taxonomy_topic"),
        F.col("label").alias("_lbl"),
    )
    other_label = topic_labels.get("other", "Other")
    r = (
        r.join(F.broadcast(tl), "taxonomy_topic", "left")
        .withColumn(
            "taxonomy_label", F.coalesce("_lbl", F.lit(other_label))
        )
        .withColumn(
            "taxonomy_path",
            F.concat_ws(
                "/",
                F.lit(path_prefix),
                F.col("taxonomy_topic"),
                F.col("taxonomy_leaf"),
            ),
        )
    )
    return r.drop("_cat", "_catl", "_t1", "_l1", "_t2", "_l2", "_lbl")


def _trim(col):
    return F.trim(F.coalesce(col, F.lit("")))


def dedup_hash_col(title, url):
    """compute_dedup_hash (data_contract.py:81-89): md5 over
    'lower(trim(title))||lower(trim(url))'."""
    return F.md5(
        F.concat(F.lower(_trim(title)), F.lit("||"), F.lower(_trim(url)))
    )


def validation_issues_col(title, content, fallback_text=None):
    """array<string> of contract-violation codes for one record — the
    Column form of validate_article (data_contract.py:91-118).

    * MISSING_FIELD:title / :content — required field empty after strip;
      content falls back to ``fallback_text`` (the reference checks
      raw['content'] or raw['text']).
    * TITLE_TOO_SHORT — present but < MIN_TITLE_CHARS.
    * CONTENT_TOO_SHORT — present but < MIN_CONTENT_CHARS.
    """
    t = _trim(title)
    c = _trim(content)
    if fallback_text is not None:
        c = F.when(c == "", _trim(fallback_text)).otherwise(c)
    issues = F.array(
        F.when(t == "", F.lit(MISSING_TITLE)),
        F.when(c == "", F.lit(MISSING_CONTENT)),
        F.when((t != "") & (F.length(t) < MIN_TITLE_CHARS), F.lit(TITLE_TOO_SHORT)),
        F.when((c != "") & (F.length(c) < MIN_CONTENT_CHARS), F.lit(CONTENT_TOO_SHORT)),
    )
    return F.filter(issues, lambda x: x.isNotNull())


def normalize_tags_col(tags):
    """normalize_tags (data_contract.py:121-133) for the comma-joined
    string form: split on ',', trim, drop empties → array<string>."""
    # NB: lambda, not bare F.trim — transform passes (element, index) to
    # two-arg callables and trim(col, trimStr) would eat the index
    return F.filter(
        F.transform(
            F.split(F.coalesce(tags, F.lit("")), ","), lambda x: F.trim(x)
        ),
        lambda x: x != F.lit(""),
    )


def normalize_records(
    raw: DataFrame,
    title_col: str = "title",
    content_col: str = "content",
    url_col: str = "url",
    tags_col: str | None = "tags",
    order_col: str = "row_id",
    fallback_text_col: str | None = None,
    category_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """_normalize_records (document_service.py:111-155) as two DataFrames:

    returns ``(normalized, rejected)``:
    * ``rejected`` — one row per (record, issue code), including DUPLICATE
      rows for valid records whose dedup hash was already seen (keep-first
      by ``order_col``). Columns: ``order_col``, ``issue``.
    * ``normalized`` — the surviving records with reference-normalized
      fields: dense 0-based ``doc_id`` in kept order, ``article_id`` (the
      dedup hash, the reference's fallback when no explicit article_id),
      trimmed ``title``/``content``, ``text`` = content, ``tags`` array,
      ``dedup_hash`` — plus the four ``taxonomy_*`` columns when
      ``category_col`` is given (broadcast dim-table normalization, see
      ``taxonomy_cols``).
    """
    fallback = F.col(fallback_text_col) if fallback_text_col else None
    base = raw.withColumn(
        "_issues",
        validation_issues_col(F.col(title_col), F.col(content_col), fallback),
    ).withColumn("_h", dedup_hash_col(F.col(title_col), F.col(url_col)))

    invalid = base.filter(F.size("_issues") > 0)
    valid = base.filter(F.size("_issues") == 0)
    # keep-first by order_col within each dedup-hash group (reference keeps
    # the first occurrence in record order, document_service.py:133-138)
    w = Window.partitionBy("_h").orderBy(F.asc(order_col))
    valid = valid.withColumn("_rn", F.row_number().over(w))
    dups = valid.filter(F.col("_rn") > 1)
    kept = valid.filter(F.col("_rn") == 1)

    rejected = invalid.select(
        F.col(order_col), F.explode("_issues").alias("issue")
    ).unionByName(dups.select(F.col(order_col), F.lit(DUPLICATE).alias("issue")))

    content = _trim(F.col(content_col))
    if fallback is not None:
        content = F.when(content == "", _trim(fallback)).otherwise(content)
    fields = kept.select(
        F.col("_h").alias("article_id"),
        _trim(F.col(title_col)).alias("title"),
        content.alias("content"),
        content.alias("text"),
        (
            normalize_tags_col(F.col(tags_col))
            if tags_col
            else F.array().cast("array<string>")
        ).alias("tags"),
        F.col("_h").alias("dedup_hash"),
        F.col(order_col),
        *([F.col(category_col)] if category_col else []),
    )
    if category_col:
        fields = taxonomy_cols(fields, category_col=category_col).drop(
            category_col
        )
    # dense 0..N-1 doc_id in kept order — the reference's enumeration
    # counter (document_service.py:140), assigned via the scalable
    # two-pass offsets pattern rather than a single-partition window
    from ..docids import _dense_ids

    out = _dense_ids(fields, [order_col])
    return out, rejected
