"""Bucketed co-located join + salted skew join: correctness AND the
plan shapes that make them worth having."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark.catalog import Catalog
from mister_spark.functions.skew import salted_join
from mister_spark.plans import physical_plan
from mister_spark.sources.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    write_bucketed(c["lineitem"].select("l_orderkey", "l_quantity"),
                   "t_li_bucketed", "l_orderkey")
    write_bucketed(c["orders"].select("o_orderkey", "o_totalprice")
                   .withColumnRenamed("o_orderkey", "l_orderkey"),
                   "t_ord_bucketed", "l_orderkey")
    # disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (at real scale neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", ["l_orderkey"])
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    joined = bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", ["l_orderkey"])
    want = (
        c["lineitem"].select("l_orderkey", "l_quantity")
        .join(c["orders"].withColumnRenamed("o_orderkey", "l_orderkey")
              .select("l_orderkey", "o_totalprice"), ["l_orderkey"])
        .count()
    )
    assert joined.count() == want


def test_salted_join_equals_plain_join(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    li = c["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")
    part = c["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = li.join(part, ["l_partkey"]).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, part, "l_partkey", salt=4).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
