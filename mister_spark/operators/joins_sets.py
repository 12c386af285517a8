"""Join variants, set operations, subquery patterns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money
from mister_spark.registry import query


@query(
    "j_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (single shuffle on the key)."""
    c = cat(spark, sf_dir)
    return (
        c["customer"]
        .join(c["orders"].select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "j_semi",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def j_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)
    return (
        c["part"]
        .join(c["lineitem"].select("l_partkey"),
              F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand")
    )


@query(
    "set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich   AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM buyers UNION SELECT k FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n
    FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n
    FROM (SELECT k FROM buyers EXCEPT SELECT k FROM rich)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cardinalities over two key sets."""
    c = cat(spark, sf_dir)
    # the three set operations each read both key frames — checkpoint so
    # the orders scan + distinct runs once, not three times
    buyers = (
        c["orders"].select(F.col("o_custkey").alias("k")).distinct().localCheckpoint()
    )
    rich = (
        c["customer"]
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
        .localCheckpoint()
    )
    rows = [
        ("union", buyers.union(rich).distinct()),
        ("intersect", buyers.intersect(rich)),
        ("except", buyers.exceptAll(rich.distinct()).distinct()),
    ]
    out = None
    for op, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = one if out is None else out.unionAll(one)
    return out


@query(
    "sq_scalar",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def sq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: broadcast the 1-row aggregate, no driver collect."""
    orders = cat(spark, sf_dir)["orders"]
    avg1 = orders.agg(F.avg("o_totalprice").alias("global_avg"))
    return (
        orders.join(F.broadcast(avg1))
        .filter(F.col("o_totalprice") > F.col("global_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sq_correlated",
    oracle="""
    SELECT FLOOR((SUM(l1.l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def sq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated subquery, decorrelated into a join
    against the per-part average (one shuffle, reused scan)."""
    c = cat(spark, sf_dir)
    li = c["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    brand = c["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )
