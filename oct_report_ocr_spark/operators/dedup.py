"""Deduplication operators for a webtext training-data pipeline.

Exact dedup, MinHash+LSH candidate pairs, n-gram Jaccard, and SimHash —
all expressed as native DataFrame/array expressions (no Python UDFs),
each with a DuckDB oracle built from the same Python constants so the
two engines cannot drift.

Scale notes (10¹²-doc posture):
- exact dedup is one hash-shuffle on the fingerprint key;
- MinHash/LSH shuffles once on (band_id, band_val) — the self-join is
  an equi-join on the band key, so skewed bands (boilerplate-identical
  pages) are the hot spot; at scale add a band-frequency cap before the
  join (drop bands with > K members into a separate heavy-hitter pass);
- SimHash is embarrassingly parallel (map-only signature, then a
  shuffle on the signature for bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load

N_HASHES = 8  # minhash functions
N_BANDS = 4  # bands of 2 hashes each
SHINGLE = 3  # words per shingle


def _tokens(col):
    return F.split(F.trim(F.regexp_replace(F.lower(col), "[^a-z ]", "")), " +")


_TOKENS_SQL = "string_split_regex(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')), ' +')"


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact near-head dedup: md5 of the first-5-token prefix groups
    boilerplate-identical heads; keep the min doc_id as representative
    (one hash aggregation — the canonical exact-dedup shape)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    key = F.md5(F.concat_ws(" ", F.slice(_tokens(F.col("text")), 1, 5)))
    return (
        d.select(key.alias("content_key"), "doc_id")
        .groupBy("content_key")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


SQL_DEDUP_EXACT = f"""
WITH t AS (
  SELECT doc_id,
         md5(array_to_string(list_slice({_TOKENS_SQL}, 1, 5), ' ')) AS content_key
  FROM documents WHERE n_chars > 0
)
SELECT content_key, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_members
FROM t GROUP BY content_key
"""


def _minhash_cols(shingles):
    """h_j = lexicographic min over shingles of md5(j || '|' || shingle).
    String-min is portable; numeric conversion of hex is not.

    NB: the salt literal must be bound OUTSIDE the lambda — a 2-param
    lambda would make Spark pass the array index as the second arg."""

    def one(j: int):
        prefix = F.lit(f"{j}|")
        return F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(prefix, s)))
        ).alias(f"h{j}")

    return [one(j) for j in range(N_HASHES)]


def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures over 3-word shingles (the signature half of
    MinHash+LSH near-dup detection)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    toks = _tokens(F.col("text"))
    d = d.select("doc_id", toks.alias("ws")).filter(F.size("ws") >= SHINGLE)
    shingles = F.transform(
        F.sequence(F.lit(0), F.size("ws") - SHINGLE),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("ws"), i + 1),
            F.element_at(F.col("ws"), i + 2),
            F.element_at(F.col("ws"), i + 3),
        ),
    )
    return d.select("doc_id", *_minhash_cols(shingles))


def _minhash_sql_core() -> str:
    h_exprs = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> md5('{j}|' || s))) AS h{j}"
        for j in range(N_HASHES)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS ws
  FROM documents WHERE n_chars > 0
), sh AS (
  SELECT doc_id,
         list_transform(range(0, len(ws) - {SHINGLE - 1}),
                        i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS shingles
  FROM toks WHERE len(ws) >= {SHINGLE}
), mh AS (
  SELECT doc_id,
         {h_exprs}
  FROM sh
)
"""


SQL_MINHASH_SIGNATURES = _minhash_sql_core() + "SELECT * FROM mh"


def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding: 4 bands × 2 hashes; docs sharing any band value are
    candidate near-duplicate pairs (shingle→minhash→band→bucket-join).
    One shuffle on the band key; output distinct (doc_a < doc_b)."""
    sig = q_minhash_signatures(spark, sf)
    bands = F.array(
        *[F.md5(F.concat(F.col(f"h{2*i}"), F.col(f"h{2*i+1}"))) for i in range(N_BANDS)]
    )
    exploded = sig.select("doc_id", F.posexplode(bands).alias("band_id", "band_val"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


SQL_MINHASH_LSH_PAIRS = _minhash_sql_core() + f"""
, bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_id, md5(h{2*i} || h{2*i+1}) AS band_val FROM mh" for i in range(N_BANDS))}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band_id, band_val)
WHERE a.doc_id < b.doc_id
"""


def q_ngram_jaccard_adjacent(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard between consecutive doc_ids (the verify step
    that follows LSH candidate generation; adjacent pairing keeps the
    oracle O(n))."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    toks = _tokens(F.col("text"))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        )
    )
    g = d.select("doc_id", grams.alias("grams")).filter(F.size("grams") > 0)
    a, b = g.alias("a"), g.alias("b")
    joined = a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    return joined.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 6).alias("jaccard"),
    )


SQL_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS ws
  FROM documents WHERE n_chars > 0
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(ws) - {SHINGLE - 1}),
                        i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS grams
  FROM toks WHERE len(ws) >= {SHINGLE}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 6) AS jaccard
FROM g a JOIN g b ON a.doc_id + 1 = b.doc_id
"""


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash over word tokens: bit b is the sign of the sum of
    ±1 votes, where token t votes +1 on bit b iff hex digit b of md5(t)
    has its high bit set. Fully portable integer arithmetic."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    toks = _tokens(F.col("text"))

    def bit(b: int):
        votes = F.transform(
            toks,
            lambda t: F.when(
                F.instr(F.lit("89abcdef"), F.substring(F.md5(t), b + 1, 1)) > 0, 1
            ).otherwise(-1),
        )
        total = F.aggregate(votes, F.lit(0), lambda acc, x: acc + x)
        return F.when(total >= 0, F.lit(2**b)).otherwise(F.lit(0))

    sig = bit(0)
    for b in range(1, 16):
        sig = sig + bit(b)
    return d.select("doc_id", sig.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(ws, t -> CASE WHEN instr('89abcdef', substr(md5(t), {b + 1}, 1)) > 0 THEN 1 ELSE -1 END)) >= 0 THEN {2**b} ELSE 0 END)"
        for b in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS ws
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM toks
"""


SQL_SIMHASH = _simhash_sql()


QUERIES: dict = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS),
    "ngram_jaccard_adjacent": (q_ngram_jaccard_adjacent, SQL_NGRAM_JACCARD),
    "simhash": (q_simhash, SQL_SIMHASH),
}
