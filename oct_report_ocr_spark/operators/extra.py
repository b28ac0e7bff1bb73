"""Remaining SURVEY.md §2 operators + webtext pipeline extras, each
with a DuckDB oracle (same determinism rules as relational.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load
from .textops import _occ, _occ_sql

# --------------------------------------------------------------------------
# U1 literal form — multi-branch UNION ALL classifier (utils.py:509-625).
# relational.q_like_chain_classifier is the optimized single-pass CASE;
# this is the reference's literal shape (4 scans stacked), kept to show
# both and to let the bench compare their plans.
# --------------------------------------------------------------------------


def q_union_multibranch(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    t = F.lower(F.col("p_type"))
    b1 = p.filter(t.like("%promo%")).select("p_partkey", F.lit("promotional").alias("category"))
    b2 = p.filter(~t.like("%promo%") & t.like("%econo%")).select(
        "p_partkey", F.lit("economy").alias("category")
    )
    b3 = p.filter(
        ~t.like("%promo%") & ~t.like("%econo%") & (t.like("%standard%") | t.like("%medium%"))
    ).select("p_partkey", F.lit("mainline").alias("category"))
    b4 = p.filter(
        ~t.like("%promo%")
        & ~t.like("%econo%")
        & ~(t.like("%standard%") | t.like("%medium%"))
    ).select("p_partkey", F.lit("other").alias("category"))
    return b1.unionByName(b2).unionByName(b3).unionByName(b4)


SQL_UNION_MULTIBRANCH = """
SELECT p_partkey, 'promotional' AS category FROM part WHERE lower(p_type) LIKE '%promo%'
UNION ALL
SELECT p_partkey, 'economy' FROM part
WHERE lower(p_type) NOT LIKE '%promo%' AND lower(p_type) LIKE '%econo%'
UNION ALL
SELECT p_partkey, 'mainline' FROM part
WHERE lower(p_type) NOT LIKE '%promo%' AND lower(p_type) NOT LIKE '%econo%'
  AND (lower(p_type) LIKE '%standard%' OR lower(p_type) LIKE '%medium%')
UNION ALL
SELECT p_partkey, 'other' FROM part
WHERE lower(p_type) NOT LIKE '%promo%' AND lower(p_type) NOT LIKE '%econo%'
  AND NOT (lower(p_type) LIKE '%standard%' OR lower(p_type) LIKE '%medium%')
"""


# --------------------------------------------------------------------------
# J8/U3 — join on a 2-col key after a union (utils.py:948-960)
# --------------------------------------------------------------------------


def q_union_then_join(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    small = p.filter(F.col("p_size") < 25).select(
        "p_partkey", F.lit("small").alias("size_class")
    )
    big = p.filter(F.col("p_size") >= 25).select(
        "p_partkey", F.lit("big").alias("size_class")
    )
    classes = small.unionByName(big).withColumn("p_partkey2", F.col("p_partkey"))
    li = load(spark, sf, "lineitem").withColumn("p_partkey2", F.col("l_partkey"))
    joined = li.join(classes, (li.l_partkey == classes.p_partkey) & (li.p_partkey2 == classes.p_partkey2))
    return joined.groupBy("size_class").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("sum_qty"),
    )


SQL_UNION_THEN_JOIN = """
WITH classes AS (
  SELECT p_partkey, 'small' AS size_class, p_partkey AS p_partkey2 FROM part WHERE p_size < 25
  UNION ALL
  SELECT p_partkey, 'big', p_partkey FROM part WHERE p_size >= 25
)
SELECT size_class, COUNT(*) AS n_items,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
FROM lineitem JOIN classes ON l_partkey = p_partkey AND l_partkey = p_partkey2
GROUP BY size_class
"""


# --------------------------------------------------------------------------
# P7 — boolean-mask filter keeping NULLs (utils.py:1295)
# --------------------------------------------------------------------------


def q_null_safe_filter(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    k = F.regexp_extract("props", r"\d+", 0).try_cast("long")
    with_k = ev.select("event_id", k.alias("k"))
    # keep rows where k >= 50 OR k IS NULL — the "drop bad rows but keep
    # missing" mask from the reference's medication prefilter
    return with_k.filter((F.col("k") >= 50) | F.col("k").isNull())


SQL_NULL_SAFE_FILTER = """
WITH t AS (SELECT event_id, TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events)
SELECT event_id, k FROM t WHERE k >= 50 OR k IS NULL
"""


# --------------------------------------------------------------------------
# F14 — medication laterality with the reference's operator-precedence
# quirk preserved (utils.py:1265-1285): the Python line
#     leftcount == rightcount & leftcount > 0
# parses as the CHAINED comparison
#     (leftcount == (rightcount & leftcount)) AND ((rightcount & leftcount) > 0)
# because & binds tighter than ==. We reproduce exactly that, in both
# engines, with explicit parentheses (SURVEY.md §7.3 risk 1).
# --------------------------------------------------------------------------


def q_medlat_quirk(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    marker = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(" apply to both eyes"))
        .when(F.col("doc_id") % 5 == 1, F.lit(" left eye drop"))
        .when(F.col("doc_id") % 5 == 2, F.lit(" right eye drop"))
        .when(F.col("doc_id") % 5 == 3, F.lit(" left eye and right eye"))
        .otherwise(F.lit(""))
    )
    note = F.lower(F.concat(F.col("text"), marker))
    left, right = _occ(note, "left eye"), _occ(note, "right eye")
    band = right.bitwiseAND(left)
    medlat = (
        F.when(note.contains("both"), F.lit(2))
        .when(left > right, F.lit(1))
        .when(right > left, F.lit(0))
        .when((left == band) & (band > 0), F.lit(2))  # the quirk, verbatim
        .otherwise(F.lit(None))
        .cast("long")
    )
    return d.select("doc_id", medlat.alias("medlat"))


SQL_MEDLAT_QUIRK = f"""
WITH n AS (
  SELECT doc_id,
         lower(text || CASE WHEN doc_id % 5 = 0 THEN ' apply to both eyes'
                            WHEN doc_id % 5 = 1 THEN ' left eye drop'
                            WHEN doc_id % 5 = 2 THEN ' right eye drop'
                            WHEN doc_id % 5 = 3 THEN ' left eye and right eye'
                            ELSE '' END) AS note
  FROM documents
), c AS (
  SELECT doc_id, note,
         {_occ_sql('note', 'left eye')} AS l,
         {_occ_sql('note', 'right eye')} AS r
  FROM n
)
SELECT doc_id,
       CAST(CASE WHEN contains(note, 'both') THEN 2
                 WHEN l > r THEN 1
                 WHEN r > l THEN 0
                 WHEN (l = (r & l)) AND ((r & l) > 0) THEN 2
                 ELSE NULL END AS BIGINT) AS medlat
FROM c
"""


# --------------------------------------------------------------------------
# F16 — spherical equivalent arithmetic (utils.py:1215-1217)
# --------------------------------------------------------------------------


def q_spherical_equivalent(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    sph = ((F.col("p_size") % 10) - 5).cast("decimal(18,2)")
    cyl = (-(F.col("p_size") % 4)).cast("decimal(18,2)")
    spheq = sph + F.lit(0.5).cast("decimal(18,2)") * cyl
    return p.select(
        "p_partkey",
        F.round(sph.cast("double"), 2).alias("sph"),
        F.round(cyl.cast("double"), 2).alias("cyl"),
        F.round(spheq.cast("double"), 2).alias("spheq"),
    )


SQL_SPHERICAL_EQUIVALENT = """
WITH t AS (
  SELECT p_partkey,
         CAST((p_size % 10) - 5 AS DECIMAL(18,2)) AS sph,
         CAST(-(p_size % 4) AS DECIMAL(18,2)) AS cyl
  FROM part
)
SELECT p_partkey,
       ROUND(CAST(sph AS DOUBLE), 2) AS sph,
       ROUND(CAST(cyl AS DOUBLE), 2) AS cyl,
       ROUND(CAST(sph + CAST(0.5 AS DECIMAL(18,2)) * cyl AS DOUBLE), 2) AS spheq
FROM t
"""


# --------------------------------------------------------------------------
# S12 analog — typed metadata projection from a composite string (URL
# parsing via portable regex; the DICOM-attr projection utils.py:1602-1619)
# --------------------------------------------------------------------------


def q_url_parts(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"^https?://([^/]+)/", 1).alias("host"),
        F.regexp_extract(url, r"^https?://[^/]+(/.*)$", 1).alias("path"),
        F.regexp_extract(url, r"\.([a-z]+)\.[a-z]+/", 1).alias("sld"),
    )


SQL_URL_PARTS = r"""
WITH t AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS path,
       regexp_extract(url, '\.([a-z]+)\.[a-z]+/', 1) AS sld
FROM t
"""


# --------------------------------------------------------------------------
# D8 analog / one-row-to-many — token explode with position (the spans
# audit table shape) + A4 frequency count + repetition-ratio quality op
# --------------------------------------------------------------------------


def _toks():
    return F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")), " +")


_TOKS_SQL = "string_split_regex(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')), ' +')"


def q_explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    head = F.slice(_toks(), 1, 5)
    return d.select("doc_id", F.posexplode(head).alias("pos", "token")).select(
        "doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "token"
    )


SQL_EXPLODE_TOKENS = f"""
WITH t AS (SELECT doc_id, list_slice({_TOKS_SQL}, 1, 5) AS toks FROM documents WHERE n_chars > 0)
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
       unnest(toks) AS token
FROM t
"""


def q_token_frequency(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    tok = d.select(F.explode(_toks()).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
    )


SQL_TOKEN_FREQUENCY = f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents WHERE n_chars > 0)
GROUP BY token HAVING COUNT(*) >= 100
"""


def q_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Quality op: most-frequent-token share per document (boilerplate /
    spam detector in webtext pipelines)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    tok = d.select("doc_id", F.explode(_toks()).alias("token"))
    per = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.max("c").alias("top_count"), F.sum("c").alias("n_tokens")
    )
    return agg.select(
        "doc_id",
        F.col("top_count").cast("long").alias("top_count"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("top_count") / F.col("n_tokens"), 6).alias("repetition_ratio"),
    )


SQL_REPETITION_RATIO = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents WHERE n_chars > 0),
per AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token)
SELECT doc_id,
       CAST(MAX(c) AS BIGINT) AS top_count,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS repetition_ratio
FROM per GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# F17 — concept rename via dict lookup (utils.py:1220-1221, exam_dict
# :51-127): a map LITERAL evaluated in codegen (the broadcast-dim-join
# alternative is shown in relational.q_dim_join_agg / cohort)
# --------------------------------------------------------------------------

_EVENT_LABELS = [
    ("click", "user_click"),
    ("view", "page_view"),
    ("purchase", "checkout_complete"),
    ("signup", "account_created"),
]


def q_map_decode(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    lookup = F.create_map(
        *[F.lit(x) for pair in _EVENT_LABELS for x in pair]
    )
    return ev.select(
        "event_id",
        F.coalesce(lookup[F.col("event_type")], F.lit("other")).alias("concept"),
    )


SQL_MAP_DECODE = (
    "SELECT event_id, CASE "
    + " ".join(f"WHEN event_type = '{k}' THEN '{v}'" for k, v in _EVENT_LABELS)
    + " ELSE 'other' END AS concept FROM events"
)


# --------------------------------------------------------------------------
# P8 — SQL-string predicate filter (utils.py:1379 `df.query(...)`) over
# a P1 star projection (utils.py:469-473): Catalyst parses the string
# into the same predicate tree and still prunes/pushes it down.
# --------------------------------------------------------------------------


def q_where_string(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select("*")
        .where("o_orderpriority = '1-URGENT' and o_totalprice > 200000")
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


SQL_WHERE_STRING = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
"""


# --------------------------------------------------------------------------
# J7 — equi-join on a composite natural key (utils.py:1036-1044 joins
# USING (pat_enc_csn_id, pat_mrn, pat_id, contact_date)): per-key
# aggregate joined back to detail rows on the full 3-column key.
# --------------------------------------------------------------------------


def q_composite_key_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    keys = ["l_orderkey", "l_partkey", "l_suppkey"]
    per_key = li.groupBy(*keys).agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias(
            "key_qty"
        )
    )
    return (
        li.join(per_key, on=keys)
        .filter(F.col("key_qty") > 45)
        .select(*keys, F.col("l_linenumber").cast("long").alias("l_linenumber"), "key_qty")
    )


SQL_COMPOSITE_KEY_JOIN = """
WITH per_key AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS key_qty
  FROM lineitem GROUP BY l_orderkey, l_partkey, l_suppkey
)
SELECT l.l_orderkey, l.l_partkey, l.l_suppkey,
       CAST(l.l_linenumber AS BIGINT) AS l_linenumber, p.key_qty
FROM lineitem l JOIN per_key p USING (l_orderkey, l_partkey, l_suppkey)
WHERE p.key_qty > 45
"""


# --------------------------------------------------------------------------
# Training-pipeline staples: per-group top-k (corpus curation: best docs
# per source), exact interpolated percentiles (length distribution for
# batch sizing), and an approx-distinct contract (HLL cardinality checked
# against the exact count — each engine runs its OWN sketch, the shared
# contract is the relative-error bound, which is what a pipeline relies on)
# --------------------------------------------------------------------------


def q_grouped_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            F.col("rk").cast("long").alias("rk"),
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


SQL_GROUPED_TOPK = """
SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents WHERE n_chars > 0
) WHERE rk <= 3
"""


def q_length_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles of doc length per source (Spark
    `percentile` == DuckDB `quantile_cont`, both exact)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    return d.groupBy("source").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99"),
    )


SQL_LENGTH_PERCENTILES = """
SELECT source,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
       ROUND(quantile_cont(n_chars, 0.9), 4) AS p90,
       ROUND(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents WHERE n_chars > 0 GROUP BY source
"""


def q_approx_distinct_check(spark: SparkSession, sf: str) -> DataFrame:
    """HLL cardinality contract: each engine runs its own
    approx-distinct sketch over doc texts; the comparable output is the
    exact count plus a flag that the sketch landed within 5% of it —
    the property a 10¹²-row pipeline actually depends on."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    exact = F.countDistinct("text")
    approx = F.approx_count_distinct("text", 0.02)
    return d.groupBy("lang").agg(
        exact.cast("long").alias("exact_distinct"),
        (F.abs(approx - exact) / exact < 0.05).alias("approx_within_5pct"),
    )


SQL_APPROX_DISTINCT_CHECK = """
SELECT lang,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
       (ABS(approx_count_distinct(text) - COUNT(DISTINCT text))
        / CAST(COUNT(DISTINCT text) AS DOUBLE) < 0.05) AS approx_within_5pct
FROM documents WHERE n_chars > 0 GROUP BY lang
"""


# --------------------------------------------------------------------------
# D8 gate twin — anchor-with-context as a relational operator. The real
# audit artifact (sources/io.audit_render) anchors extracted field
# values to their source line ±1 line of context over the extraction
# output, which DuckDB cannot reproduce; this query expresses the SAME
# anchor±context semantics over the documents table (token anchors,
# lag/lead neighbours) so the driver gate can verify the windowing
# engine-for-engine, while tests/test_sources_io.py pins the real
# artifact against the golden fixtures.
# --------------------------------------------------------------------------


def q_audit_anchors(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    toks = d.select("doc_id", F.posexplode(_toks()).alias("pos", "token"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    ctx = toks.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        "token",
        F.lag("token", 1).over(w).alias("context_before"),
        F.lead("token", 1).over(w).alias("context_after"),
    )
    return ctx.filter(F.col("token") == "table")


SQL_AUDIT_ANCHORS = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE n_chars > 0),
e AS (
  SELECT doc_id,
         CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
         unnest(toks) AS token
  FROM t
), ctx AS (
  SELECT doc_id, pos, token,
         LAG(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS context_before,
         LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS context_after
  FROM e
)
SELECT * FROM ctx WHERE token = 'table'
"""


# --------------------------------------------------------------------------
# S12 depth — typed head-metadata projection as a pure-expression operator
# (utils.py:1602-1619: 14 ds.* DICOM attrs → typed row; here the 5-field
# web head projection). The gate variant synthesizes a deterministic
# <head> from documents columns IDENTICALLY in both engines, then pulls
# the fields with the same regexes extract/htmlseg.page_metadata uses in
# the Arrow path — so the driver gate checks the puller's regex
# semantics engine-for-engine while the golden suite checks the Python
# twin byte-for-byte.
# --------------------------------------------------------------------------

_META_PATTERNS = {
    "title": "<title[^>]*>(.*?)</title>",
    "meta_description": '<meta name="description" content="([^"]*)"',
    "charset": 'charset="([A-Za-z0-9_-]+)"',
    "canonical_url": '<link rel="canonical" href="([^"]*)"',
    "og_type": '<meta property="og:type" content="([^"]*)"',
}


def q_doc_metadata(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    sid = F.col("doc_id").cast("string")
    head = F.concat(
        F.lit('<head><meta charset="utf-8"><title>'),
        F.col("source"), F.lit(" doc "), sid, F.lit("</title>"),
        F.when(
            F.col("doc_id") % 5 != 0,
            F.concat(F.lit('<meta name="description" content="Summary of doc '), sid, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(F.lit('<link rel="canonical" href="https://example.com/d/'), sid, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 != 0,
            F.concat(
                F.lit('<meta property="og:type" content="'),
                F.when(F.col("doc_id") % 2 == 1, F.lit("article")).otherwise(F.lit("website")),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head>"),
    )
    cols = [F.col("doc_id")]
    for name, pat in _META_PATTERNS.items():
        cols.append(F.nullif(F.regexp_extract(head, pat, 1), F.lit("")).alias(name))
    return d.select(*cols)


def _doc_metadata_sql() -> str:
    pulls = ",\n       ".join(
        f"nullif(regexp_extract(head, '{pat}', 1), '') AS {name}"
        for name, pat in _META_PATTERNS.items()
    )
    return f"""
WITH h AS (
  SELECT doc_id,
         '<head><meta charset="utf-8"><title>' || source || ' doc ' || doc_id::VARCHAR || '</title>'
         || CASE WHEN doc_id % 5 <> 0
                 THEN '<meta name="description" content="Summary of doc ' || doc_id::VARCHAR || '">'
                 ELSE '' END
         || CASE WHEN doc_id % 3 <> 0
                 THEN '<link rel="canonical" href="https://example.com/d/' || doc_id::VARCHAR || '">'
                 ELSE '' END
         || CASE WHEN doc_id % 7 <> 0
                 THEN '<meta property="og:type" content="'
                      || CASE WHEN doc_id % 2 = 1 THEN 'article' ELSE 'website' END || '">'
                 ELSE '' END
         || '</head>' AS head
  FROM documents
)
SELECT doc_id,
       {pulls}
FROM h
"""


SQL_DOC_METADATA = _doc_metadata_sql()


# --------------------------------------------------------------------------
# Training-pipeline extra: deterministic stratified sampling — fixed
# per-stratum quotas (here: per-lang), selection order by a content
# hash so the sample is stable across engines, partitionings, and
# retries. The per-stratum window is the standard scale shape: one
# shuffle on the stratum key, top-N per group; no driver-side
# collection, no PRNG (PRNG sequences are engine-specific — md5 is
# bit-identical everywhere). The P14 analog generalized from a global
# rate to per-group quotas.
# --------------------------------------------------------------------------

STRATUM_QUOTA = 40  # docs per lang


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf, "documents")
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_QUOTA)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("rank_in_stratum"))
    )


SQL_STRATIFIED_SAMPLE = f"""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5('strat:' || doc_id::VARCHAR) ASC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank_in_stratum
FROM r WHERE rn <= {STRATUM_QUOTA}
"""


QUERIES: dict = {
    "doc_metadata": (q_doc_metadata, SQL_DOC_METADATA),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "audit_anchors": (q_audit_anchors, SQL_AUDIT_ANCHORS),
    "union_multibranch": (q_union_multibranch, SQL_UNION_MULTIBRANCH),
    "grouped_topk": (q_grouped_topk, SQL_GROUPED_TOPK),
    "length_percentiles": (q_length_percentiles, SQL_LENGTH_PERCENTILES),
    "approx_distinct_check": (q_approx_distinct_check, SQL_APPROX_DISTINCT_CHECK),
    "map_decode": (q_map_decode, SQL_MAP_DECODE),
    "where_string": (q_where_string, SQL_WHERE_STRING),
    "composite_key_join": (q_composite_key_join, SQL_COMPOSITE_KEY_JOIN),
    "union_then_join": (q_union_then_join, SQL_UNION_THEN_JOIN),
    "null_safe_filter": (q_null_safe_filter, SQL_NULL_SAFE_FILTER),
    "medlat_quirk": (q_medlat_quirk, SQL_MEDLAT_QUIRK),
    "spherical_equivalent": (q_spherical_equivalent, SQL_SPHERICAL_EQUIVALENT),
    "url_parts": (q_url_parts, SQL_URL_PARTS),
    "explode_tokens": (q_explode_tokens, SQL_EXPLODE_TOKENS),
    "token_frequency": (q_token_frequency, SQL_TOKEN_FREQUENCY),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION_RATIO),
}
