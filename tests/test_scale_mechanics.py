"""Scale-mechanics tests: salting correctness + bucketed shuffle-free joins."""

import os

from pyspark.sql import functions as F

from oct_report_ocr_spark.operators.skew import salted_join, write_bucketed
from oct_report_ocr_spark.plans.report import plan_checks

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    """Salting must not change the result set — only the partitioning."""
    li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    # make the key skewed: collapse most keys onto one hot key
    fact = li.withColumn(
        "hotkey", F.when(F.col("l_orderkey") % 7 != 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    ).select("hotkey", "l_quantity", "l_extendedprice", "l_linenumber")
    dim = (
        fact.select("hotkey").distinct().withColumn("dim_val", F.col("hotkey") * 2)
    )
    plain = fact.join(dim, ["hotkey"], "inner")
    salted = salted_join(fact, dim, "hotkey", n_salts=8)
    a = sorted(tuple(r) for r in plain.select(sorted(plain.columns)).collect())
    b = sorted(tuple(r) for r in salted.select(sorted(salted.columns)).collect())
    assert a == b
    # the join key must actually include the salt (skew scattered)
    p = salted._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark):
    """Two tables bucketed on the same key join with ZERO exchanges."""
    li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    write_bucketed(li.select("l_orderkey", "l_quantity"), "t_li_b", "l_orderkey")
    write_bucketed(od.select("o_orderkey", "o_totalprice"), "t_od_b", "o_orderkey")
    try:
        a = spark.table("t_li_b")
        b = spark.table("t_od_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        # disable auto-broadcast so the test exercises the bucketed path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            c = plan_checks(joined)
            assert c["n_exchanges"] == 0, c
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_od_b")


def test_unbucketed_same_join_shuffles(spark):
    """Control: the identical join without bucketing needs exchanges —
    proving the bucketed layout is what removed them."""
    li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = plan_checks(li.join(od, li.l_orderkey == od.o_orderkey))
        assert c["n_exchanges"] >= 2, c
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
