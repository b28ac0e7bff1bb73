"""Temporal operators Spark lacks as single primitives or where the
primitive deserves an oracle: session windows and as-of joins.

- ``session_window``: the reference's ≤1-day-gap medication-range merge
  (utils.py:1306-1325) is session-window-shaped (SURVEY.md §2.9); here
  the NATIVE ``F.session_window`` (streaming-capable) is oracle-checked
  against the hand-rolled gaps-and-islands SQL — proving the two forms
  agree.
- ``asof_join``: the reference's point-in-interval medication lookup
  (utils.py:1382-1385) generalizes to an as-of join. The scalable
  implementation is NOT a range join: tag both streams, union, and take
  ``last(value, ignorenulls)`` over a (user, time)-ordered window —
  one shuffle on the user key, no pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import load

GAP = "1 hour"
_GAP_US = 3_600_000_000


def q_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Native session_window vs hand-rolled islands: per-user sessions
    where consecutive events are ≤1h apart; window end = last event +
    gap (Spark session_window semantics, reproduced in the oracle)."""
    ev = load(spark, sf, "events")
    s = (
        ev.groupBy(F.session_window(F.col("ts"), GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
    )
    return s.select(
        "user_id",
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.col("w.end").cast("timestamp")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


SQL_SESSION_WINDOW = f"""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, CAST(value AS DECIMAL(18,2)) AS v
  FROM events
), flagged AS (
  SELECT *, CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                  OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > {_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM pts
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_id
  FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(v) AS DOUBLE), 2) AS sum_value
FROM numbered GROUP BY user_id, s_id
"""


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """For every click, the value and time of the latest purchase
    at-or-before it for the same user. Union-and-window (one shuffle),
    not a pair join. Equal-ts tie: the purchase wins (sorted before the
    click), matching an inclusive `<=` as-of; multiple same-ts
    purchases tie-break on event_id."""
    ev = load(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("ts_us"),
        "event_id",
        F.lit(0).alias("is_click"),
        F.round(F.col("value").cast("decimal(18,2)").cast("double"), 2).alias("pval"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("ts_us"), "event_id", F.lit(1).alias("is_click"),
        F.lit(None).cast("double").alias("pval"),
    )
    tagged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = tagged.withColumn("last_purchase_value", F.last("pval", ignorenulls=True).over(w)).withColumn(
        "last_purchase_ts_us",
        F.last(F.when(F.col("is_click") == 0, F.col("ts_us")), ignorenulls=True).over(w),
    )
    return joined.filter(F.col("is_click") == 1).select(
        "event_id", "user_id", "ts_us", "last_purchase_value", "last_purchase_ts_us"
    )


SQL_ASOF_JOIN = """
WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, 0 AS is_click,
         ROUND(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 2) AS pval
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, epoch_us(ts), event_id, 1, NULL
  FROM events WHERE event_type = 'click'
), winded AS (
  SELECT *,
         LAST_VALUE(pval IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, is_click, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value,
         LAST_VALUE(CASE WHEN is_click = 0 THEN ts_us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, is_click, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts_us
  FROM tagged
)
SELECT event_id, user_id, ts_us, last_purchase_value, last_purchase_ts_us
FROM winded WHERE is_click = 1
"""


QUERIES: dict = {
    "session_window": (q_session_window, SQL_SESSION_WINDOW),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
}
