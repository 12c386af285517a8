"""Relational / OLAP suite — TPC-H adapted to the driver schema.

Spark-first design notes (SURVEY.md §6):
- Filters sit directly on base scans so Catalyst pushes them into the
  parquet reader (verified by tests/test_plans.py).
- Dimension sides (region/nation/supplier/part) are broadcast explicitly;
  fact-fact joins shuffle once on the join key with AQE skew handling.
- Top-k queries sort on the ROUNDED measure with explicit tiebreaks so
  the DuckDB oracle selects identical rows (common.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio, revenue, ts
from mister_spark.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100                                    AS sum_qty,
           FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100                               AS sum_base_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100            AS sum_disc_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
           FLOOR((AVG(l_quantity)) * 10000 + 0.5) / 10000                                    AS avg_qty,
           FLOOR((AVG(l_extendedprice)) * 10000 + 0.5) / 10000                               AS avg_price,
           FLOOR((AVG(l_discount)) * 10000 + 0.5) / 10000                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-filter-aggregate; partial aggregation map-side."""
    li = cat(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(revenue())).alias("sum_disc_price"),
            money(F.sum(revenue() * (1 + F.col("l_tax")))).alias("sum_charge"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            ratio(F.avg("l_extendedprice")).alias("avg_price"),
            ratio(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS rev,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY rev DESC, odate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    cust = c["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = c["orders"].filter(F.col("o_orderdate") < ts("1998-06-01"))
    li = c["lineitem"].filter(F.col("l_shipdate") > ts("1998-06-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
        )
        .agg(money(F.sum(revenue())).alias("rev"))
        .select("l_orderkey", "rev", "odate", "o_orderpriority")
        .orderBy(F.desc("rev"), "odate", "l_orderkey")
        .limit(10)
    )


@query(
    "q4_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-adapted: EXISTS via left-semi join (no lineitem duplication)."""
    c = cat(spark, sf_dir)
    orders = c["orders"].filter(
        (F.col("o_orderdate") >= ts("1997-01-01")) & (F.col("o_orderdate") < ts("1997-07-01"))
    )
    li = c["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n_name, FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS rev
    FROM customer JOIN orders   ON c_custkey  = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey  = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: one fact-fact shuffle (orders⋈lineitem); all dims broadcast."""
    c = cat(spark, sf_dir)
    orders = c["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    asia_nations = (
        c["nation"]
        .join(F.broadcast(c["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        c["supplier"]
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        c["lineitem"]
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c["customer"].select("c_custkey", "c_nationkey"),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(money(F.sum(revenue())).alias("rev"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT FLOOR((SUM(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan+filter+fold; every predicate pushed to parquet."""
    li = cat(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1998-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("rev"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS rev,
           FLOOR((c_acctbal) * 100 + 0.5) / 100 AS acctbal, n_name
    FROM customer JOIN orders   ON c_custkey  = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, FLOOR((c_acctbal) * 100 + 0.5) / 100, n_name
    ORDER BY rev DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    orders = c["orders"].filter(
        (F.col("o_orderdate") >= ts("1997-01-01")) & (F.col("o_orderdate") < ts("1997-04-01"))
    )
    li = c["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", money(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .agg(money(F.sum(revenue())).alias("rev"))
        .select("c_custkey", "c_name", "rev", "acctbal", "n_name")
        .orderBy(F.desc("rev"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT FLOOR((100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    li = c["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1997-03-01")) & (F.col("l_shipdate") < ts("1997-04-01"))
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(c["part"].select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(ratio(100.0 * F.sum(promo) / F.sum(revenue())).alias("promo_pct"))
    )


@query(
    "q16_parts_suppliers",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    part = c["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        c["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
           FLOOR((o_totalprice) * 100 + 0.5) / 100 AS total, FLOOR((big.sum_qty) * 100 + 0.5) / 100 AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 200) big ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: groupBy-HAVING then join back to orders/customer."""
    c = cat(spark, sf_dir)
    big = (
        c["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 200)
    )
    return (
        c["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c["customer"].select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            money(F.col("o_totalprice")).alias("total"),
            money(F.col("raw_qty")).alias("sum_qty"),
        )
    )


@query(
    "q19_disjunctive_join",
    oracle="""
    SELECT FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    part = c["part"].select("p_partkey", "p_brand", "p_size")
    li = c["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(money(F.sum(revenue())).alias("rev"))
    )
