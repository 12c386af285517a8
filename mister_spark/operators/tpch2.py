"""Second relational wave: TPC-H Q7/Q8/Q13/Q15/Q22 adapted to the
driver schema (no partsupp/shipmode columns; nation pairs and shares
keep the original join topology)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, revenue, rnd, ts
from mister_spark.registry import query


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS rev
    FROM lineitem JOIN orders   ON o_orderkey = l_orderkey
                  JOIN supplier ON s_suppkey  = l_suppkey
                  JOIN customer ON c_custkey  = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
        OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bidirectional nation-pair trade volume by ship year.

    The testdata nations are NATION_0..24; the pair (NATION_19,
    NATION_11) is the highest-volume pair at the gate SF so the result
    is non-empty (the round-1 FRANCE/GERMANY literals matched nothing
    and the gate passed vacuously on 0 rows both engines)."""
    c = cat(spark, sf_dir)
    n1 = c["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = c["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = c["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1996-01-01")) & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    pair = (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_11") | (
        F.col("supp_nation") == "NATION_11"
    ) & (F.col("cust_nation") == "NATION_19")
    return (
        li.join(c["orders"].select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(money(F.sum(revenue())).alias("rev"))
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_orders AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS vol,
             n1.n_name AS supp_nation
      FROM lineitem JOIN orders   ON o_orderkey = l_orderkey
                    JOIN supplier ON s_suppkey  = l_suppkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN customer ON c_custkey  = o_custkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
                    JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           FLOOR((SUM(CASE WHEN supp_nation = 'NATION_19' THEN vol ELSE 0 END)
                  / SUM(vol)) * 10000 + 0.5) / 10000 AS mkt_share
    FROM all_orders GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of European customer volume per year.

    NATION_19 (a nation with suppliers at every testdata SF) replaces
    the round-1 GERMANY literal, which matched no synthetic nation and
    made the share column vacuously zero."""
    c = cat(spark, sf_dir)
    europe_cust = (
        c["customer"].select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                c["nation"]
                .join(
                    F.broadcast(c["region"].filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        c["supplier"].select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                c["nation"].select(
                    F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = c["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1998-01-01"))
    )
    vol = revenue()
    german = F.when(F.col("supp_nation") == "NATION_19", vol).otherwise(F.lit(0.0))
    return (
        c["lineitem"]
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(europe_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(ratio(F.sum(german) / F.sum(vol)).alias("mkt_share"))
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count (left join keeps
    zero-order customers; two shuffles, both on shrinking keys)."""
    c = cat(spark, sf_dir)
    per_cust = (
        c["customer"].select("c_custkey")
        .join(c["orders"].select("o_custkey", "o_orderkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey,
             FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue — max computed on the
    ROUNDED total (both engines pick identical winners) via a window max
    instead of a rescan."""
    c = cat(spark, sf_dir)
    srev = (
        c["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(money(F.sum(revenue())).alias("total_rev"))
    )
    w = W.partitionBy()
    best = srev.withColumn("mx", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("mx")
    )
    return (
        best.join(F.broadcast(c["supplier"].select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q22_global_sales",
    oracle="""
    WITH hot AS (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)),
    inactive AS (
      SELECT * FROM hot
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
    SELECT COUNT(*) AS numcust,
           FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS totacctbal
    FROM inactive
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-adapted: high-balance customers with no orders (scalar
    subquery broadcast + anti join)."""
    c = cat(spark, sf_dir)
    cust = c["customer"].select("c_custkey", "c_acctbal")
    avg_pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    hot = cust.join(F.broadcast(avg_pos)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    inactive = hot.join(
        c["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return inactive.agg(
        F.count(F.lit(1)).alias("numcust"), money(F.sum("c_acctbal")).alias("totacctbal")
    )


@query(
    "ev_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type)
    SELECT event_id, e.event_type,
           FLOOR(((value - mu) / sd) * 10000 + 0.5) / 10000 AS z
    FROM events e JOIN stats USING (event_type)
    WHERE ABS((value - mu) / sd) >= 2.5
    """,
)
def ev_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flagging: tiny stats aggregate broadcast
    back onto the event stream (no per-row shuffle of the fact side)."""
    ev = cat(spark, sf_dir)["events"]
    stats = ev.groupBy(F.col("event_type").alias("st")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), F.col("event_type") == F.col("st"))
        .filter(F.abs(z) >= 2.5)
        .select("event_id", "event_type", rnd(z, 4).alias("z"))
    )
