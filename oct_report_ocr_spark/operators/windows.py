"""Bounded-frame and rank-bucket window operators (round-3 tail
widening). The registry already covers unbounded running aggregates
(W2 `running_min`, reference utils.py:762-804 first-visit logic) and
global ORDER BY (W4); these add the two remaining window surfaces a
monitoring/curation pipeline uses:

- ``rolling_stats``: a bounded ROWS frame (moving sum/avg) — the
  telemetry-smoothing shape. One shuffle+sort on the partition key,
  then a single streaming pass per partition; the frame is O(1) state
  regardless of partition size, so it scales to arbitrarily long user
  histories (unlike RANGE frames over skewed keys, which AQE cannot
  split — noted below).
- ``ntile_bins``: exact rank-quartile binning per language. ntile
  needs the full per-lang sort (one skewed exchange), so at 10¹² rows
  the scale path is the mergeable quantile sketch
  (`quantile_sketch_check`) to derive bin EDGES followed by a map-only
  binning pass; ntile is the exact-rank form the sketch path is
  validated against at small sf — the same exact-vs-sketch contract
  pattern as approx_distinct_check / quantile_sketch_check.

Float discipline (VERDICT r02): events.value is DOUBLE, and windowed
double summation is engine-order-dependent — so the rolling sum runs
over exact BIGINT cents (floor(value*100), identical IEEE multiply +
floor in both engines) and the rolling mean is ONE correctly-rounded
division of exact integers, bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import load


def q_rolling_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user 3-event moving sum/mean over the event stream (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW; deterministic (ts, event_id)
    order). Exact integer frame arithmetic; see module docstring."""
    e = load(spark, sf, "events")
    cents = F.floor(F.col("value") * F.lit(100)).cast("bigint")
    d = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        cents.alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return d.select(
        "event_id",
        "user_id",
        "ts_us",
        "cents",
        F.sum("cents").over(w).alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
        (F.sum("cents").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "roll_avg"
        ),
    )


SQL_ROLLING_STATS = """
WITH d AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_us, cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum,
       COUNT(*) OVER w AS roll_n,
       CAST(SUM(cents) OVER w AS DOUBLE) / COUNT(*) OVER w AS roll_avg
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_ntile_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-language length quartiles: ntile(4) over a unique
    (n_chars, doc_id) order, then one hash aggregate per (lang,
    quartile) cell — count plus exact char-range edges. The small-sf
    exact-rank truth the sketch-derived binning path is checked
    against (module docstring)."""
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    binned = d.select("lang", "n_chars", F.ntile(4).over(w).alias("quartile"))
    return binned.groupBy("lang", "quartile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


SQL_NTILE_BINS = """
WITH binned AS (
  SELECT lang, n_chars,
         CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
              AS INTEGER) AS quartile
  FROM documents WHERE n_chars > 0
)
SELECT lang, quartile, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM binned GROUP BY lang, quartile
"""


QUERIES: dict = {
    "rolling_stats": (q_rolling_stats, SQL_ROLLING_STATS),
    "ntile_bins": (q_ntile_bins, SQL_NTILE_BINS),
}
