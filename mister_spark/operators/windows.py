"""Window functions and multi-dimensional aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money
from mister_spark.registry import query


@query(
    "w_topn_per_group",
    oracle="""
    SELECT p_brand, p_partkey, FLOOR((p_retailprice) * 100 + 0.5) / 100 AS price, rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
)
def w_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand — the distributed 'argmax per key' pattern."""
    part = cat(spark, sf_dir)["part"]
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", money(F.col("p_retailprice")).alias("price"), "rn")
    )


@query(
    "w_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FLOOR((SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING)) * 100 + 0.5) / 100 AS running
    FROM orders
    """,
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (ordered prefix sum → deterministic)."""
    orders = cat(spark, sf_dir)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", money(F.sum("o_totalprice").over(w)).alias("running")
    )


@query(
    "w_lag_delta",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS rev
      FROM orders GROUP BY 1)
    SELECT day, rev, FLOOR((rev - LAG(rev) OVER (ORDER BY day)) * 100 + 0.5) / 100 AS delta
    FROM daily
    """,
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta (lag over a pre-aggregated series)."""
    orders = cat(spark, sf_dir)["orders"]
    daily = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(money(F.sum("o_totalprice")).alias("rev"))
    )
    w = W.orderBy("day")
    return daily.select(
        "day", "rev", money(F.col("rev") - F.lag("rev").over(w)).alias("delta")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS total, COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    joined = (
        c["customer"]
        .join(F.broadcast(c["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        money(F.sum("c_acctbal")).alias("total"), F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = cat(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        money(F.sum("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT r_name, n_name, FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS total
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL API (same Catalyst plan)."""
    c = cat(spark, sf_dir)
    c["customer"].createOrReplaceTempView("gs_customer")
    c["nation"].createOrReplaceTempView("gs_nation")
    c["region"].createOrReplaceTempView("gs_region")
    return spark.sql(
        """
        SELECT r_name, n_name, FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS total
        FROM gs_customer JOIN gs_nation ON c_nationkey = n_nationkey
                         JOIN gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name))
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted by type (fixed category list)."""
    ev = cat(spark, sf_dir)["events"]
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )
