"""Relational operator library — SURVEY.md §2.2–2.6 re-expressed as
native DataFrame transforms, each paired with its DuckDB oracle SQL.

Every entry in ``QUERIES`` maps a name to ``(fn, oracle_sql)`` where
``fn(spark, sf_dir) -> DataFrame`` and the SQL produces the identical
result on the same parquet (driver contract in /root/repo/__spark_entry__.py).
Cross-engine determinism rules used throughout:

- sums/avgs aggregate in ``decimal(18,2)`` (exact, order-independent),
  then cast to double and round — never raw double accumulation, whose
  low bits depend on reduction order;
- integer-valued outputs are cast to ``bigint`` on both sides;
- timestamps compared as-is (both engines run naive-UTC here); interval
  arithmetic is done in epoch microseconds (``unix_micros`` /
  ``epoch_us``) to avoid engine-specific interval semantics;
- every computed column is aliased identically in both engines.

Reference citations (file:line into /root/reference/) identify the
behavior each operator re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# §2.1/2.2 — scans, filters, projections
# --------------------------------------------------------------------------


def q_filtered_scan(spark: SparkSession, sf: str) -> DataFrame:
    """S2: filtered metadata scan — the `DocumentTitle like` analog
    (extract_gcc_report_text_ou.py:25-29). Predicate pushed to parquet."""
    return (
        load(spark, sf, "documents")
        .filter((F.col("lang") == "en") & F.col("text").like("%window%"))
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )


SQL_FILTERED_SCAN = """
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE lang = 'en' AND text LIKE '%window%'
"""


def q_project_arith(spark: SparkSession, sf: str) -> DataFrame:
    """P2: explicit projection + arithmetic (net price), exact decimal
    math then rounded double (utils.py:700-702, :1215-1217)."""
    li = load(spark, sf, "lineitem")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(net.cast("double"), 4).alias("net_price"),
    )


SQL_PROJECT_ARITH = """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS net_price
FROM lineitem
"""


def q_like_chain_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """P4/U1: the reference's LIKE-chain diagnosis classifier with 4-way
    UNION ALL (utils.py:509-625) re-expressed as a single-pass CASE —
    one scan instead of four."""
    p = load(spark, sf, "part")
    t = F.lower(F.col("p_type"))
    category = (
        F.when(t.like("%promo%"), "promotional")
        .when(t.like("%econo%"), "economy")
        .when(t.like("%standard%") | t.like("%medium%"), "mainline")
        .otherwise("other")
    )
    return p.select("p_partkey", category.alias("category"))


SQL_LIKE_CHAIN = """
SELECT p_partkey,
       CASE WHEN lower(p_type) LIKE '%promo%' THEN 'promotional'
            WHEN lower(p_type) LIKE '%econo%' THEN 'economy'
            WHEN lower(p_type) LIKE '%standard%' OR lower(p_type) LIKE '%medium%' THEN 'mainline'
            ELSE 'other' END AS category
FROM part
"""


def q_in_list(spark: SparkSession, sf: str) -> DataFrame:
    """P5: IN-list predicate (utils.py:534-543) + count by key."""
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_IN_LIST = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH','5-LOW')
GROUP BY o_orderpriority
"""


def q_try_cast_json(spark: SparkSession, sf: str) -> DataFrame:
    """P10/P6: lenient cast (`safe_cast`, utils.py:717) + NULL filter on
    a value regex-extracted from the props JSON string."""
    ev = load(spark, sf, "events")
    k = F.regexp_extract(F.col("props"), r"\d+", 0).try_cast("long")
    return ev.select("event_id", k.alias("k")).filter(F.col("k").isNotNull())


SQL_TRY_CAST_JSON = """
SELECT event_id, TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
FROM events WHERE TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) IS NOT NULL
"""


def q_case_decode(spark: SparkSession, sf: str) -> DataFrame:
    """P12: CASE WHEN decode of a code column (utils.py:1028-1033)."""
    o = load(spark, sf, "orders")
    label = (
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
    )
    return o.groupBy(label.alias("status_label")).agg(F.count(F.lit(1)).alias("n"))


SQL_CASE_DECODE = """
SELECT CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'partial' END AS status_label,
       COUNT(*) AS n
FROM orders GROUP BY 1
"""


def q_deterministic_sample(spark: SparkSession, sf: str) -> DataFrame:
    """P14: deterministic audit sample — the `df.sample(n=115,
    random_state=1)` analog (extract_gcc_report_text_ou.py:32), made
    engine-portable via a fixed multiplicative hash instead of a PRNG."""
    d = load(spark, sf, "documents")
    return d.filter((F.col("doc_id") * 40503) % 256 < 16).select("doc_id", "lang")


SQL_DET_SAMPLE = """
SELECT doc_id, lang FROM documents WHERE (doc_id * 40503) % 256 < 16
"""


def q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """P9: DISTINCT projection (utils.py:766, :1028)."""
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    """P11/F21: date-part extraction + interval arithmetic
    (utils.py:701, :1318, :1364-1365). Year difference uses boundary
    crossing (BigQuery date_diff(YEAR) semantics) = year(a)-year(b)."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        (F.lit(2026) - F.year("o_orderdate")).cast("long").alias("order_age_years"),
    )


SQL_DATE_PARTS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(2026 - year(o_orderdate) AS BIGINT) AS order_age_years
FROM orders
"""


# --------------------------------------------------------------------------
# §2.3 — joins
# --------------------------------------------------------------------------


def q_eav_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """J1: the EAV widening the reference does with 5 SQL self-joins
    (utils.py:707-749) — idiomatic Spark: groupBy().pivot() with an
    explicit value list (one shuffle, no self-joins)."""
    ev = load(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.max(F.col("value").cast("decimal(18,2)")))
    )
    cols = [F.col("user_id")] + [
        F.round(F.col(t).cast("double"), 2).alias(f"max_{t}") for t in types
    ]
    return piv.select(*cols)


SQL_EAV_PIVOT = """
SELECT user_id,
       ROUND(CAST(MAX(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS max_click,
       ROUND(CAST(MAX(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS max_error,
       ROUND(CAST(MAX(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS max_purchase,
       ROUND(CAST(MAX(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS max_signup,
       ROUND(CAST(MAX(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS max_view
FROM events GROUP BY user_id
"""


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """J2: semi-join via IN-subquery — qualifying encounters
    (utils.py:750-762): users with ≥3 clicks AND ≥1 purchase."""
    ev = load(spark, sf, "events")
    qual = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purch"),
        )
        .filter((F.col("n_click") >= 3) & (F.col("n_purch") >= 1))
    )
    return (
        ev.join(qual, ["user_id"], "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


SQL_SEMI_JOIN = """
SELECT user_id, COUNT(*) AS n_events
FROM events
WHERE user_id IN (
  SELECT user_id FROM events
  GROUP BY user_id
  HAVING SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) >= 3
     AND SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) >= 1
)
GROUP BY user_id
"""


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """J3: anti-join via NOT IN (utils.py:668). NULL semantics note: the
    join key (o_custkey) is non-nullable here, so NOT IN ≡ left_anti —
    pinned in both engines (SURVEY.md §7.3 risk 4)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_dim_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """J4: dimension joins (utils.py:764-769) with explicit broadcast of
    the small dims; revenue per region (A1-style agg on top)."""
    li = load(spark, sf, "lineitem")
    s = F.broadcast(load(spark, sf, "supplier"))
    n = F.broadcast(load(spark, sf, "nation"))
    r = F.broadcast(load(spark, sf, "region"))
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DIM_JOIN_AGG = """
SELECT r_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_filtered_self_join(spark: SparkSession, sf: str) -> DataFrame:
    """J5/J6: the left-eye/right-eye filtered self-join pattern
    (utils.py:811-824, :863-876): two filtered aggregates of the same
    table joined back on the natural key."""
    ev = load(spark, sf, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.round(F.max(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("click_max"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.round(F.max(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("view_max"))
    )
    return clicks.join(views, ["user_id"], "inner")


SQL_FILTERED_SELF_JOIN = """
SELECT c.user_id, c.click_max, v.view_max
FROM (SELECT user_id, ROUND(CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS click_max
      FROM events WHERE event_type='click' GROUP BY user_id) c
JOIN (SELECT user_id, ROUND(CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS view_max
      FROM events WHERE event_type='view' GROUP BY user_id) v
USING (user_id)
"""


def q_interval_point_join(spark: SparkSession, sf: str) -> DataFrame:
    """J9: point-in-interval join (utils.py:1382-1385): purchase events
    define intervals [ts, ts + value*100s]; count click events inside
    any same-user interval. Equi-key (user_id) + range predicate —
    executes as a hash join with a residual range filter, not a
    nested-loop (the equi-key is what makes this scale)."""
    ev = load(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dur_us = (F.col("value").cast("decimal(18,2)") * 100_000_000).cast("long")
    intervals = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("start_us"), (us + dur_us).alias("end_us")
    )
    points = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("point_us"), "event_id"
    )
    joined = points.join(intervals, "user_id").filter(
        (F.col("point_us") >= F.col("start_us")) & (F.col("point_us") <= F.col("end_us"))
    )
    return joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_hits"))


SQL_INTERVAL_POINT_JOIN = """
WITH intervals AS (
  SELECT user_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 100000000 AS BIGINT) AS end_us
  FROM events WHERE event_type = 'purchase'
), points AS (
  SELECT user_id, epoch_us(ts) AS point_us FROM events WHERE event_type = 'click'
)
SELECT p.user_id, COUNT(*) AS n_hits
FROM points p JOIN intervals i
  ON p.user_id = i.user_id AND p.point_us >= i.start_us AND p.point_us <= i.end_us
GROUP BY p.user_id
"""


# --------------------------------------------------------------------------
# §2.4 — aggregations
# --------------------------------------------------------------------------


def q_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """A1/P13: group-by with conditional sums (utils.py:756-759)."""
    ev = load(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("long").alias("n_view"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_error"),
    )


SQL_CONDITIONAL_AGG = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type='view'  THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def q_group_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A2/A3/A5: per-group count/min/max/mean/stddev — mean and variance
    from exact decimal sums (order-independent), matching utils.py:991,
    :1237, :344-345."""
    ev = load(spark, sf, "events")
    v = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
        F.sum(v).alias("_sum"),
        F.sum((v * v).cast("decimal(38,4)")).alias("_sumsq"),
    )
    mean = F.col("_sum").cast("double") / F.col("n")
    var = (F.col("_sumsq").cast("double") - F.col("_sum").cast("double") ** 2 / F.col("n")) / F.col("n")
    return g.select(
        "user_id",
        "n",
        F.round(F.col("_min").cast("double"), 2).alias("min_value"),
        F.round(F.col("_max").cast("double"), 2).alias("max_value"),
        F.round(mean, 4).alias("mean_value"),
        F.round(var, 4).alias("var_value"),
    )


SQL_GROUP_STATS = """
SELECT user_id, COUNT(*) AS n,
       ROUND(CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_value,
       ROUND(CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_value,
       ROUND((CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
              - POW(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) / COUNT(*)) / COUNT(*), 4) AS var_value
FROM events GROUP BY user_id
"""


def q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """A6: binned histogram with percentage-of-total via a window over
    the whole result (utils.py:417-443)."""
    li = load(spark, sf, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "<10")
        .when(F.col("l_quantity") < 20, "10-19")
        .when(F.col("l_quantity") < 30, "20-29")
        .when(F.col("l_quantity") < 40, "30-39")
        .otherwise(">=40")
    )
    counts = li.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        "bucket",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("pct"),
    )


SQL_HISTOGRAM = """
WITH counts AS (
  SELECT CASE WHEN l_quantity < 10 THEN '<10'
              WHEN l_quantity < 20 THEN '10-19'
              WHEN l_quantity < 30 THEN '20-29'
              WHEN l_quantity < 40 THEN '30-39'
              ELSE '>=40' END AS bucket,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1
)
SELECT bucket, n, ROUND(n / SUM(n) OVER (), 6) AS pct FROM counts
"""


def q_linreg(spark: SparkSession, sf: str) -> DataFrame:
    """A7: closed-form OLS (slope/intercept/r) from exact decimal sums —
    the stats.linregress analog (utils.py:362-414)."""
    li = load(spark, sf, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_discount").cast("decimal(18,2)")
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        F.col("n").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r, 6).alias("r"),
    )


SQL_LINREG = """
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy
  FROM lineitem
)
SELECT n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
FROM s
"""


# --------------------------------------------------------------------------
# §2.5 — window functions & order-dependent ops
# --------------------------------------------------------------------------


def q_window_min(spark: SparkSession, sf: str) -> DataFrame:
    """W1: whole-partition min (utils.py:948)."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.min(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"), 2).alias(
            "min_price_per_cust"
        ),
    )


SQL_WINDOW_MIN = """
SELECT o_orderkey, o_custkey,
       ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE), 2)
         AS min_price_per_cust
FROM orders
"""


def q_running_min(spark: SparkSession, sf: str) -> DataFrame:
    """W2: running min per key in time order — the `top_priority_clean`
    client-side loop (utils.py:972-1003) as a pure Window. event_id
    breaks ts ties so the frame is total-ordered (determinism)."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.min(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2).alias(
            "running_min"
        ),
    )


SQL_RUNNING_MIN = """
SELECT event_id, user_id,
       ROUND(CAST(MIN(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_min
FROM events
"""


def q_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """W3: gaps-and-islands interval coalescing — the `fupdated`
    medication-range merge (utils.py:1306-1325). Each event spans
    [ts, ts + value*100s]; intervals whose start is within 1h of the
    running max end of prior intervals merge into one island. Uses
    cumulative MAX of end (not lag) so contained intervals are handled —
    the reference's "only update if greater" branch (utils.py:1319-1321,
    SURVEY.md §7.3 risk 5)."""
    ev = load(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dur_us = (F.col("value").cast("decimal(18,2)") * 100_000_000).cast("long")
    iv = ev.select(
        "user_id", "event_id", us.alias("start_us"), (us + dur_us).alias("end_us")
    )
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us", "event_id")
    prev_max_end = F.max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    gap_us = 3_600_000_000  # 1 hour
    new_island = F.when(
        prev_max_end.isNull() | (F.col("start_us") > prev_max_end + gap_us), 1
    ).otherwise(0)
    islands = iv.withColumn(
        "island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("start_us").alias("island_start_us"),
        F.max("end_us").alias("island_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_GAPS_ISLANDS = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 100000000 AS BIGINT) AS end_us
  FROM events
), flagged AS (
  SELECT *,
         CASE WHEN MAX(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start_us > MAX(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us, event_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 3600000000
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), numbered AS (
  SELECT *, SUM(new_island) OVER (PARTITION BY user_id ORDER BY start_us, end_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       MIN(start_us) AS island_start_us, MAX(end_us) AS island_end_us,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, island
"""


def q_top_n_sort(spark: SparkSession, sf: str) -> DataFrame:
    """W4: global ORDER BY + deterministic LIMIT (utils.py:772 etc.),
    tie-broken on the key so both engines pick identical rows."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round(F.col("o_totalprice").cast("decimal(18,2)").cast("double"), 2).alias("o_totalprice"))
    )


SQL_TOP_N_SORT = """
SELECT o_orderkey, ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# §2.6 — set operations
# --------------------------------------------------------------------------


def q_union_renamed(spark: SparkSession, sf: str) -> DataFrame:
    """U2: rename-to-common-schema UNION ALL — the left-eye/right-eye
    stack (utils.py:909-916)."""
    s = load(spark, sf, "supplier").select(
        F.col("s_suppkey").cast("long").alias("entity_key"),
        F.round(F.col("s_acctbal").cast("decimal(18,2)").cast("double"), 2).alias("balance"),
        F.lit("supplier").alias("side"),
    )
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("entity_key"),
        F.round(F.col("c_acctbal").cast("decimal(18,2)").cast("double"), 2).alias("balance"),
        F.lit("customer").alias("side"),
    )
    return s.unionByName(c)


SQL_UNION_RENAMED = """
SELECT CAST(s_suppkey AS BIGINT) AS entity_key,
       ROUND(CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS balance,
       'supplier' AS side
FROM supplier
UNION ALL
SELECT CAST(c_custkey AS BIGINT) AS entity_key,
       ROUND(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS balance,
       'customer' AS side
FROM customer
"""


# name -> (query_fn, oracle_sql)
QUERIES: dict = {
    "filtered_scan": (q_filtered_scan, SQL_FILTERED_SCAN),
    "project_arith": (q_project_arith, SQL_PROJECT_ARITH),
    "like_chain_classifier": (q_like_chain_classifier, SQL_LIKE_CHAIN),
    "in_list": (q_in_list, SQL_IN_LIST),
    "try_cast_json": (q_try_cast_json, SQL_TRY_CAST_JSON),
    "case_decode": (q_case_decode, SQL_CASE_DECODE),
    "deterministic_sample": (q_deterministic_sample, SQL_DET_SAMPLE),
    "distinct": (q_distinct, SQL_DISTINCT),
    "date_parts": (q_date_parts, SQL_DATE_PARTS),
    "eav_pivot": (q_eav_pivot, SQL_EAV_PIVOT),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "dim_join_agg": (q_dim_join_agg, SQL_DIM_JOIN_AGG),
    "filtered_self_join": (q_filtered_self_join, SQL_FILTERED_SELF_JOIN),
    "interval_point_join": (q_interval_point_join, SQL_INTERVAL_POINT_JOIN),
    "conditional_agg": (q_conditional_agg, SQL_CONDITIONAL_AGG),
    "group_stats": (q_group_stats, SQL_GROUP_STATS),
    "histogram": (q_histogram, SQL_HISTOGRAM),
    "linreg": (q_linreg, SQL_LINREG),
    "window_min": (q_window_min, SQL_WINDOW_MIN),
    "running_min": (q_running_min, SQL_RUNNING_MIN),
    "gaps_islands": (q_gaps_islands, SQL_GAPS_ISLANDS),
    "top_n_sort": (q_top_n_sort, SQL_TOP_N_SORT),
    "union_renamed": (q_union_renamed, SQL_UNION_RENAMED),
}
