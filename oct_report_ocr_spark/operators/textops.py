"""Scalar-normalizer and text-analysis operators (SURVEY.md §2.7 +
training-data-pipeline text ops), all as native Column expressions —
no Python UDFs — each with a DuckDB oracle.

The logMAR ladder and laterality logic are the reference's quirkiest
field normalizers (utils.py:1140-1212, :1109-1137); both are generated
from single Python tables so the Spark expression and the oracle SQL
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oct_report_ocr_spark.functions import normalizers

from .relational import load

# --------------------------------------------------------------------------
# F15 — visual-acuity → logMAR ladder (utils.py:1140-1212)
# Ordered first-match-wins substring cascade; order is load-bearing:
# 'nlp' must precede 'lp' (substring), '20/1600' must precede '20/160',
# '20/150' before '20/15', etc. — exactly the reference's elif order.
# --------------------------------------------------------------------------

# literal doubles rounded once in Python → bit-identical in both engines
_LOGMAR_LADDER = list(normalizers.LOGMAR_LADDER)


def _va_expr():
    """Synth VA strings from part rows (deterministic, engine-portable)."""
    return (
        F.when(F.col("p_partkey") % 10 == 0, F.lit("CF at 3ft"))
        .when(F.col("p_partkey") % 10 == 1, F.lit("HM only"))
        .when(F.col("p_partkey") % 10 == 2, F.lit("NLP"))
        .when(F.col("p_partkey") % 10 == 3, F.lit("LP"))
        .otherwise(F.concat(F.lit("20/"), (F.col("p_size") * 10).cast("string")))
    )


_VA_SQL = """CASE WHEN p_partkey % 10 = 0 THEN 'CF at 3ft'
         WHEN p_partkey % 10 = 1 THEN 'HM only'
         WHEN p_partkey % 10 = 2 THEN 'NLP'
         WHEN p_partkey % 10 = 3 THEN 'LP'
         ELSE '20/' || CAST(p_size * 10 AS VARCHAR) END"""


def q_logmar_ladder(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        _va_expr().alias("va"),
        normalizers.logmar_expr(_va_expr()).alias("logmar"),
    )


def _logmar_sql_plain() -> str:
    branches = "\n".join(
        f"       WHEN instr(lower(va), '{k}') > 0 THEN {v!r}" for k, v in _LOGMAR_LADDER
    )
    return f"""
WITH v AS (SELECT p_partkey, {_VA_SQL} AS va FROM part)
SELECT p_partkey, va,
       CAST(CASE
{branches}
       END AS DOUBLE) AS logmar
FROM v
"""


SQL_LOGMAR = _logmar_sql_plain()


# --------------------------------------------------------------------------
# F12/F13 — laterality counters + decision (utils.py:1109-1137)
# --------------------------------------------------------------------------

# occurrences(s, sub) via length arithmetic — portable across engines
_occ = normalizers.occurrences


def _occ_sql(col: str, sub: str) -> str:
    return f"CAST((length({col}) - length(replace({col}, '{sub}', ''))) / {len(sub)} AS BIGINT)"


def q_laterality(spark: SparkSession, sf: str) -> DataFrame:
    """Note column = doc text + planted laterality markers (same
    construction in the oracle). left>right → 1, right>left → 0, tie →
    NULL — the reference's exact decision table (utils.py:1127-1137)."""
    d = load(spark, sf, "documents")
    marker = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" LEFT EYE noted, os stable"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" right eye ok"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" left eye then right eye"))
        .otherwise(F.lit(""))
    )
    note = F.lower(F.concat(F.col("text"), marker))
    left, right = _occ(note, "left eye"), _occ(note, "right eye")
    lat = normalizers.laterality_expr(left, right)
    return d.select(
        "doc_id", left.alias("leftcount"), right.alias("rightcount"), lat.alias("laterality")
    )


SQL_LATERALITY = f"""
WITH n AS (
  SELECT doc_id,
         lower(text || CASE WHEN doc_id % 4 = 0 THEN ' LEFT EYE noted, os stable'
                            WHEN doc_id % 4 = 1 THEN ' right eye ok'
                            WHEN doc_id % 4 = 2 THEN ' left eye then right eye'
                            ELSE '' END) AS note
  FROM documents
)
SELECT doc_id,
       {_occ_sql('note', 'left eye')} AS leftcount,
       {_occ_sql('note', 'right eye')} AS rightcount,
       CAST(CASE WHEN {_occ_sql('note', 'left eye')} > {_occ_sql('note', 'right eye')} THEN 1
                 WHEN {_occ_sql('note', 'right eye')} > {_occ_sql('note', 'left eye')} THEN 0
                 ELSE NULL END AS BIGINT) AS laterality
FROM n
"""


# --------------------------------------------------------------------------
# F8/F9/F10 — token repairs as column expressions
# (extract_onh_rnfl_report_text_ou.py:134-216)
# --------------------------------------------------------------------------


def q_token_repair(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    pct_tok = F.concat(F.lit("%"), (F.col("doc_id") % 97).cast("string"))
    um_tok = F.concat((F.col("n_chars") % 200).cast("string"), F.lit(" m"))
    area_tok = F.concat((F.col("doc_id") % 7).cast("string"), F.lit(".1"))
    return d.select(
        "doc_id",
        normalizers.reversed_pct_expr(pct_tok).alias("fixed_pct"),
        normalizers.um_repair_expr(um_tok).alias("fixed_um"),
        normalizers.area_suffix_expr(area_tok).alias("area_val"),
    )


SQL_TOKEN_REPAIR = """
WITH t AS (
  SELECT doc_id,
         '%' || CAST(doc_id % 97 AS VARCHAR) AS pct_tok,
         CAST(n_chars % 200 AS VARCHAR) || ' m' AS um_tok,
         CAST(doc_id % 7 AS VARCHAR) || '.1' AS area_tok
  FROM documents
)
SELECT doc_id,
       CASE WHEN substring(pct_tok, 1, 1) = '%' THEN reverse(pct_tok) ELSE pct_tok END AS fixed_pct,
       CASE WHEN length(um_tok) <= 5 AND contains(um_tok, 'm') AND NOT contains(um_tok, 'mm')
            THEN replace(um_tok, 'm', 'μm') ELSE um_tok END AS fixed_um,
       area_tok || '^2' AS area_val
FROM t
"""


# --------------------------------------------------------------------------
# F18 — order-sensitive canonicalization chain (utils.py:1082-1097)
# --------------------------------------------------------------------------


def q_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    seg = F.col("c_mktsegment")
    # chained replaces, order-sensitive like the reference's 13-step chain
    canon = F.replace(
        F.replace(
            F.replace(seg, F.lit("AUTOMOBILE"), F.lit("AUTO")),
            F.lit("HOUSEHOLD"),
            F.lit("HOME"),
        ),
        F.lit("BUILDING"),
        F.lit("CONSTRUCTION"),
    )
    # conditional overwrite from a second column (the `ethnic` analog)
    canon = F.when(F.col("c_acctbal") < 0, F.lit("DELINQUENT")).otherwise(canon)
    return c.select("c_custkey", canon.alias("segment_canonical"))


SQL_CANONICALIZE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'DELINQUENT'
            ELSE replace(replace(replace(c_mktsegment, 'AUTOMOBILE', 'AUTO'),
                                 'HOUSEHOLD', 'HOME'),
                         'BUILDING', 'CONSTRUCTION') END AS segment_canonical
FROM customer
"""


# --------------------------------------------------------------------------
# F19/F20 — first-match device cascade with model capture
# (utils.py:1411-1459, :1479) → two output columns from one cascade
# --------------------------------------------------------------------------


def q_device_cascade(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    name = F.lower(F.col("p_name"))
    dev_type = (
        F.when(name.rlike("widget"), F.lit("widget-family"))
        .when(name.rlike("gizmo"), F.lit("gizmo-family"))
        .when(name.rlike("(bolt|ring)"), F.lit("fastener"))
        .otherwise(F.lit(None))
    )
    dev_model = (
        F.when(name.rlike("widget"), F.regexp_extract(name, r"(\w+) widget", 1))
        .when(name.rlike("gizmo"), F.regexp_extract(name, r"(\w+) gizmo", 1))
        .when(name.rlike("(bolt|ring)"), F.regexp_extract(name, r"(\w+) (?:bolt|ring)", 1))
        .otherwise(F.lit(None))
    )
    return p.select("p_partkey", dev_type.alias("dev_type"), dev_model.alias("dev_model"))


SQL_DEVICE_CASCADE = r"""
WITH t AS (SELECT p_partkey, lower(p_name) AS name FROM part)
SELECT p_partkey,
       CASE WHEN regexp_matches(name, 'widget') THEN 'widget-family'
            WHEN regexp_matches(name, 'gizmo') THEN 'gizmo-family'
            WHEN regexp_matches(name, '(bolt|ring)') THEN 'fastener'
            ELSE NULL END AS dev_type,
       CASE WHEN regexp_matches(name, 'widget') THEN regexp_extract(name, '(\w+) widget', 1)
            WHEN regexp_matches(name, 'gizmo') THEN regexp_extract(name, '(\w+) gizmo', 1)
            WHEN regexp_matches(name, '(bolt|ring)') THEN regexp_extract(name, '(\w+) (?:bolt|ring)', 1)
            ELSE NULL END AS dev_model
FROM t
"""


# --------------------------------------------------------------------------
# Text-analysis ops for a training-data pipeline (driver mandate):
# token counting, quality scoring, language-ID heuristic, fingerprinting
# --------------------------------------------------------------------------


def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_unique_tokens
FROM documents WHERE n_chars > 0
"""


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Length / character-class ratios + stopword density — the
    quality-scoring stage of a webtext pipeline (integer-exact counts,
    division last)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    text = F.col("text")
    n = F.length(text).cast("double")
    n_digit = (F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))).cast("double")
    n_space = (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))).cast("double")
    n_the = _occ(F.lower(text), " the ").cast("double")
    n_tokens = (n_space + 1)
    return d.select(
        "doc_id",
        F.round(n_digit / n, 6).alias("digit_ratio"),
        F.round(n_space / n, 6).alias("space_ratio"),
        F.round(n_the / n_tokens, 6).alias("stopword_density"),
        F.round((n - n_space) / n_tokens, 6).alias("avg_token_len"),
    )


SQL_QUALITY_SCORE = f"""
WITH t AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digit,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS n_space,
         CAST({_occ_sql("lower(text)", " the ")} AS DOUBLE) AS n_the
  FROM documents WHERE n_chars > 0
)
SELECT doc_id,
       ROUND(n_digit / n, 6) AS digit_ratio,
       ROUND(n_space / n, 6) AS space_ratio,
       ROUND(n_the / (n_space + 1), 6) AS stopword_density,
       ROUND((n - n_space) / (n_space + 1), 6) AS avg_token_len
FROM t
"""


_LANG_MARKERS = [("en", " the "), ("de", " der "), ("fr", " le "), ("es", " el ")]


def q_lang_guess(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: argmax of marker-token hit
    counts, ties → 'und' (deterministic order of comparison)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    low = F.lower(F.col("text"))
    counts = {lang: _occ(low, marker) for lang, marker in _LANG_MARKERS}
    best = F.greatest(*counts.values())
    guess = F.when(best == 0, F.lit("und"))
    for lang, _ in _LANG_MARKERS:  # first-match-wins on ties, fixed order
        guess = guess.when(counts[lang] == best, F.lit(lang))
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


def _lang_sql() -> str:
    cnt = {lang: _occ_sql("lower(text)", m) for lang, m in _LANG_MARKERS}
    greatest = "GREATEST(" + ", ".join(cnt.values()) + ")"
    branches = "\n".join(
        f"            WHEN {cnt[lang]} = {greatest} THEN '{lang}'" for lang, _ in _LANG_MARKERS
    )
    return f"""
SELECT doc_id, lang,
       CASE WHEN {greatest} = 0 THEN 'und'
{branches}
       END AS lang_guess
FROM documents WHERE n_chars > 0
"""


SQL_LANG_GUESS = _lang_sql()


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: md5 of the alphanumeric-normalized text
    (the rolling-hash/dedup-key stage of a webtext pipeline)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


SQL_FINGERPRINT = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
FROM documents WHERE n_chars > 0
"""


QUERIES: dict = {
    "logmar_ladder": (q_logmar_ladder, SQL_LOGMAR),
    "laterality": (q_laterality, SQL_LATERALITY),
    "token_repair": (q_token_repair, SQL_TOKEN_REPAIR),
    "canonicalize": (q_canonicalize, SQL_CANONICALIZE),
    "device_cascade": (q_device_cascade, SQL_DEVICE_CASCADE),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "lang_guess": (q_lang_guess, SQL_LANG_GUESS),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
}
