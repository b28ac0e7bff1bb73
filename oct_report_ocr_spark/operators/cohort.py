"""The cohort-building DAG (SURVEY.md §3.3) as ONE lazily-composed plan.

The reference runs 9 stages, each materializing a BigQuery table + CSV,
with stage N reading stage N-1 by name (utils.py:481-1055) — lineage by
naming convention, every boundary a server→pandas→CSV→server round
trip, and stage 8 (`top_priority_clean`, utils.py:972-1003) dropping to
a client-side Python loop because their SQL couldn't express a running
min.

Here the same dataflow is one DataFrame composition: Catalyst sees the
whole DAG (pushdown and join planning cross the old stage boundaries),
nothing materializes until the sink, and the client-side loop is a
Window running-min. Stage analogs on the testdata schema:

1. priority classifier (LIKE chain, utils.py:509-625)   → event_type → priority
2. non-priority codes via anti-join (utils.py:638-678)  → types not in (1)
3. EAV pivot gated by a qualifying semi-join + demographics join
   (utils.py:682-781)                                    → per-user pivot ⋈ customer
4/5. per-side filtered aggregates (utils.py:786-886)    → click/view maxes
6. rename-to-common-schema UNION + lenient cast
   (utils.py:890-924)                                    → side stack
7. dx labels + window min (utils.py:928-969)            → min priority per user
8. running min over time (utils.py:972-1003)            → Window, not a loop
9. final join + DISTINCT + CASE decode (utils.py:1027-1055)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import load


def q_cohort_dag(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    cust = load(spark, sf, "customer")

    # (1) priority classifier — LIKE-chain single pass
    t = F.lower(F.col("event_type"))
    priority = (
        F.when(t.like("%purchase%"), 1)
        .when(t.like("%signup%"), 2)
        .when(t.like("%click%"), 3)
        .otherwise(F.lit(None))
    )
    labeled = ev.withColumn("priority", priority)

    # (2) anti-join: types carrying no priority (the non-glauc codes)
    prio_types = labeled.filter(F.col("priority").isNotNull()).select("event_type").distinct()
    non_prio = (
        ev.join(prio_types, ["event_type"], "left_anti")
        .select("event_type")
        .distinct()
        .withColumn("priority", F.lit(9))
    )
    all_codes = (
        labeled.filter(F.col("priority").isNotNull())
        .select("event_type", "priority")
        .distinct()
        .unionByName(non_prio)
    )

    # (3) qualifying users (semi-join) + demographics join
    qual = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("nc"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
        )
        .filter((F.col("nc") >= 1) & (F.col("nv") >= 1))
    )
    base = ev.join(qual, ["user_id"], "left_semi").join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    )

    # (4/5/6) per-side filtered aggregates, renamed union, lenient cast
    def side(event_type: str, name: str) -> DataFrame:
        return (
            base.filter(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.max(F.col("value").cast("decimal(18,2)")).alias("side_max"))
            .select(
                "user_id",
                F.lit(name).alias("side"),
                F.round(F.col("side_max").cast("double"), 2).alias("side_max"),
            )
        )

    sides = side("click", "left").unionByName(side("view", "right"))

    # (7) event labels joined to the code table + whole-partition min
    dx = ev.join(F.broadcast(all_codes), ["event_type"])
    w_all = Window.partitionBy("user_id")
    dx = dx.withColumn("min_priority", F.min("priority").over(w_all))

    # (8) running min over time — the reference's client-side loop as a
    # pure Window (ts+event_id total order for determinism)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dx = dx.withColumn("top_priority_clean", F.min("priority").over(w_run))

    # (9) final: last clean priority per user (the corrected label),
    # joined to the side stack, DISTINCT, CASE decode
    final_prio = dx.groupBy("user_id").agg(
        F.min("top_priority_clean").alias("final_priority"),
        F.count(F.lit(1)).alias("n_events"),
    )
    decode = (
        F.when(F.col("final_priority") == 1, "converter")
        .when(F.col("final_priority") == 2, "registered")
        .when(F.col("final_priority") == 3, "engaged")
        .otherwise("passive")
    )
    out = (
        final_prio.join(sides, ["user_id"])
        .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")), final_prio.user_id == F.col("c_custkey"))
        .select(
            "user_id",
            "c_mktsegment",
            decode.alias("cohort_label"),
            "n_events",
            "side",
            "side_max",
        )
        .distinct()
    )
    return out


SQL_COHORT_DAG = """
WITH labeled AS (
  SELECT *, CASE WHEN lower(event_type) LIKE '%purchase%' THEN 1
                 WHEN lower(event_type) LIKE '%signup%' THEN 2
                 WHEN lower(event_type) LIKE '%click%' THEN 3
                 ELSE NULL END AS priority
  FROM events
), prio_types AS (
  SELECT DISTINCT event_type FROM labeled WHERE priority IS NOT NULL
), all_codes AS (
  SELECT DISTINCT event_type, priority FROM labeled WHERE priority IS NOT NULL
  UNION ALL
  SELECT DISTINCT event_type, 9 AS priority FROM events
  WHERE event_type NOT IN (SELECT event_type FROM prio_types)
), qual AS (
  SELECT user_id FROM events GROUP BY user_id
  HAVING SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) >= 1
     AND SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) >= 1
), base AS (
  SELECT e.* FROM events e
  JOIN customer c ON e.user_id = c.c_custkey
  WHERE e.user_id IN (SELECT user_id FROM qual)
), sides AS (
  SELECT user_id, 'left' AS side,
         ROUND(CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS side_max
  FROM base WHERE event_type = 'click' GROUP BY user_id
  UNION ALL
  SELECT user_id, 'right',
         ROUND(CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
  FROM base WHERE event_type = 'view' GROUP BY user_id
), dx AS (
  SELECT e.user_id, e.ts, e.event_id, a.priority,
         MIN(a.priority) OVER (PARTITION BY e.user_id) AS min_priority,
         MIN(a.priority) OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_priority_clean
  FROM events e JOIN all_codes a USING (event_type)
), final_prio AS (
  SELECT user_id, MIN(top_priority_clean) AS final_priority, COUNT(*) AS n_events
  FROM dx GROUP BY user_id
)
SELECT DISTINCT f.user_id, c.c_mktsegment,
       CASE WHEN f.final_priority = 1 THEN 'converter'
            WHEN f.final_priority = 2 THEN 'registered'
            WHEN f.final_priority = 3 THEN 'engaged'
            ELSE 'passive' END AS cohort_label,
       f.n_events, s.side, s.side_max
FROM final_prio f
JOIN sides s USING (user_id)
JOIN customer c ON f.user_id = c.c_custkey
"""


QUERIES: dict = {
    "cohort_dag": (q_cohort_dag, SQL_COHORT_DAG),
}
