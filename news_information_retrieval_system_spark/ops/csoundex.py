"""CSoundex — Chinese-Soundex phonetic encoding as pure Column expressions.

Reference parity: /root/reference/src/ir/text/csoundex.py
(normalize_pinyin :232-268, _split_initial_final :270-303,
encode_character :306-362, encode :364-396, similarity :415-493,
_is_chinese :535-558) with the public initial/final grouping tables from
/root/reference/configs/csoundex.yaml (articulation-based buckets 0-9).

Everything here is whole-stage-codegen-friendly: the pinyin parse is two
regexps + a CASE chain, the per-character text encoder is one
split/posexplode + one broadcast lexicon join + one groupBy, and fuzzy
similarity is ``zip_with``/``aggregate`` over code arrays. No Python UDFs
— the encoder scales to any corpus the tokenizer scales to.

Encoding format (mode "standard"/"loose" per the config):
    without tone (3 chars): [First_Letter][Initial_Code][Final_Code]
    with tone    (4 chars): ... + [Tone_Digit]    e.g. 張 zhang1 → Z89 / Z891
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Longest-first alternation mirrors the reference's ordered-prefix scan
# (csoundex.py:285-287): "zh" must win over "z" on "zhang".
_INITIALS_RE = "^(zh|ch|sh|b|p|m|f|d|t|n|l|g|k|h|j|q|x|r|z|c|s|y|w)"

# Reverse maps of configs/csoundex.yaml initial_groups / final_groups.
# "y"/"w" are parse-level onsets only — absent here, so they code to 0,
# exactly the reference's ``initial_to_code.get(initial, 0)``.
INITIAL_CODE = {
    "b": 1, "p": 1,
    "f": 2,
    "m": 3,
    "d": 4, "t": 4,
    "n": 5, "l": 5,
    "g": 6, "k": 6, "h": 6,
    "j": 7, "q": 7, "x": 7,
    "zh": 8, "ch": 8, "sh": 8, "r": 8,
    "z": 9, "c": 9, "s": 9,
}
FINAL_CODE = {
    "a": 1, "ia": 1, "ua": 1,
    "o": 2, "uo": 2,
    "e": 3, "ie": 3, "ue": 3, "ve": 3,
    "i": 4,
    "u": 5,
    "v": 6, "u:": 6,
    "ai": 7, "ei": 7, "ui": 7, "uai": 7,
    "ao": 8, "ou": 8, "iu": 8, "iao": 8,
    "an": 9, "en": 9, "in": 9, "un": 9, "vn": 9,
    "ang": 9, "eng": 9, "ing": 9, "ong": 9,
    "ian": 9, "uan": 9, "van": 9, "iang": 9, "uang": 9, "iong": 9,
    "er": 9,
}

# CJK ranges from _is_chinese (csoundex.py:549-556). Extension B lives in
# a supplementary plane; Java regex addresses it as a surrogate-pair range.
_CJK_RE = (
    "[\\u4e00-\\u9fff\\u3400-\\u4dbf\\uf900-\\ufaff]"
    "|[\\ud840-\\ud869][\\udc00-\\udfff]"
)


def _bucket(col: Column, mapping: dict[str, int]) -> Column:
    """Phoneme→digit bucket lookup; unknown → 0.

    A map-literal ``element_at`` instead of a 37-branch CASE chain: the
    CASE form re-inlines the (already deep) parsed-final expression into
    every branch, blowing the generated Java method past janino's limit
    and dropping the whole stage out of whole-stage codegen. The map
    lookup evaluates the key expression once and keeps codegen alive."""
    pairs: list[Column] = []
    for key, code in mapping.items():
        pairs.append(F.lit(key))
        pairs.append(F.lit(code))
    return F.coalesce(F.element_at(F.create_map(*pairs), col), F.lit(0))


def pinyin_components(col: Column) -> tuple[Column, Column, Column, Column]:
    """(base, initial, final, tone) for a TONE3 pinyin column.

    Mirrors normalize_pinyin + _split_initial_final, including the y/w
    re-spellings (yi→i, wu→u, yu-→v-) and the quirk that a consonant-only
    syllable keeps the WHOLE base as its final (``final if final else py``).
    """
    py = F.lower(F.trim(col))
    tone_digit = F.regexp_extract(py, r"(\d)$", 1)
    tone = F.when(tone_digit != "", tone_digit).otherwise(F.lit("0"))
    base = F.regexp_replace(py, r"\d$", "")
    init0 = F.regexp_extract(base, _INITIALS_RE, 1)
    rest = F.substr(base, F.length(init0) + F.lit(1), F.length(base))
    y_vowel = (init0 == "y") & rest.isin("i", "")
    w_vowel = (init0 == "w") & rest.isin("u", "")
    y_umlaut = (init0 == "y") & rest.startswith("u")
    initial = (
        F.when(y_vowel | w_vowel | y_umlaut, F.lit(""))
        .otherwise(init0)
    )
    final = (
        F.when(y_vowel, F.lit("i"))
        .when(w_vowel, F.lit("u"))
        .when(y_umlaut, F.concat(F.lit("v"), F.substr(rest, F.lit(2), F.length(rest))))
        .when(rest == "", base)
        .otherwise(rest)
    )
    return base, initial, final, tone


def csoundex_code_col(col: Column, include_tone: bool = False) -> Column:
    """CSoundex code of a pinyin syllable column (encode_character's
    pinyin branch, csoundex.py:344-362). NULL for an empty syllable."""
    py = F.lower(F.trim(col))
    base, initial, final, tone = pinyin_components(col)
    first = F.upper(F.substr(py, F.lit(1), F.lit(1)))
    code = F.concat(
        first,
        _bucket(initial, INITIAL_CODE).cast("string"),
        _bucket(final, FINAL_CODE).cast("string"),
    )
    if include_tone:
        code = F.concat(code, tone)
    return F.when(F.length(base) > 0, code)


def encode_text(
    df: DataFrame,
    lexicon: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_tone: bool = False,
    out_col: str = "csoundex",
) -> DataFrame:
    """Per-character CSoundex encoding of mixed text (encode :364-396).

    ``lexicon`` is a (char, pinyin) dim table — the char→pinyin step is a
    broadcast hash join, the idiomatic Spark shape for the reference's
    in-memory lexicon dict. Chinese chars missing from the lexicon pass
    through unchanged, ASCII letters uppercase, punctuation/digits drop.
    One shuffle (the re-assembly groupBy on ``id_col``).
    """
    chars = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "")).alias("pos", "ch"),
    ).where(F.col("ch") != "")
    joined = chars.join(
        F.broadcast(lexicon.select(F.col("char").alias("ch"),
                                   F.col("pinyin").alias("_py"))),
        "ch",
        "left",
    )
    is_cjk = F.col("ch").rlike(_CJK_RE)
    code = (
        F.when(is_cjk & F.col("_py").isNotNull(),
               csoundex_code_col(F.col("_py"), include_tone))
        .when(is_cjk, F.col("ch"))  # no pinyin → original char
        .when(F.col("ch").rlike("[A-Za-z]"), F.upper(F.col("ch")))
        .otherwise(F.lit(""))
    )
    per_char = joined.select(id_col, "pos", code.alias("code"))
    return (
        per_char.where(F.col("code") != "")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "code"))),
                    lambda s: s["code"],
                ),
            ).alias(out_col)
        )
    )


def fuzzy_similarity_col(codes_a: Column, codes_b: Column) -> Column:
    """similarity(mode='fuzzy') over two space-joined code strings
    (csoundex.py:448-464): positional matches / max token length,
    zip-truncated — as a pure array expression."""
    a = F.split(codes_a, " ")
    b = F.split(codes_b, " ")
    matches = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),  # zip pads with null
    )
    max_len = F.greatest(F.size(a), F.size(b))
    empty = (F.length(F.trim(codes_a)) == 0) | (F.length(F.trim(codes_b)) == 0)
    return F.when(empty, F.lit(0.0)).otherwise(
        matches.cast("double") / max_len
    )


def find_similar(
    queries: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.6,
    topk: int | None = None,
    query_id_col: str = "query_id",
    cand_id_col: str = "doc_id",
    codes_col: str = "csoundex",
) -> DataFrame:
    """Distributed find_similar (csoundex.py:495-533): every query is
    scored against every candidate (the reference's brute-force scan),
    kept at ``sim >= threshold``, ranked descending, head-``topk``.

    Both inputs carry pre-encoded code strings (from :func:`encode_text`).
    The query set is broadcast — the candidate table never shuffles for
    the pairing — and the similarity is a pure array expression, so the
    scan side stays in whole-stage codegen at any corpus size. Ties
    break on candidate id ascending (repo-wide deterministic-ties rule;
    the reference's Python sort is merely stable in list order)."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(codes_col).alias("_qcodes"),
        )
    )
    scored = (
        candidates.crossJoin(q)
        .withColumn(
            "similarity",
            fuzzy_similarity_col(F.col("_qcodes"), F.col(codes_col)),
        )
        .where(F.col("similarity") >= threshold)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(cand_id_col),
            "similarity",
        )
    )
    if topk is None:
        return scored
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc(cand_id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .drop("rank")
    )


def homophone_groups(
    coded: DataFrame, term_col: str = "term", code_col: str = "code"
) -> DataFrame:
    """Homophone matching (同音字匹配): group terms sharing a CSoundex
    code. One groupBy; representative = lexicographic min term."""
    return (
        coded.groupBy(code_col)
        .agg(
            F.count("*").alias("n_terms"),
            F.min(term_col).alias("rep_term"),
        )
        .where(F.col("n_terms") >= 2)
    )
