"""Statistical aggregates: exact percentiles, histograms, correlation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, rnd
from mister_spark.registry import query


@query(
    "stat_percentiles",
    oracle="""
    SELECT o_orderpriority,
           FLOOR((quantile_cont(o_totalprice, 0.5)) * 100 + 0.5) / 100  AS p50,
           FLOOR((quantile_cont(o_totalprice, 0.9)) * 100 + 0.5) / 100  AS p90,
           FLOOR((quantile_cont(o_totalprice, 0.99)) * 100 + 0.5) / 100 AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def stat_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles — matches quantile_cont semantics.
    At 100 TB swap `percentile` → `percentile_approx` (t-digest, mergeable
    map-side); exact kept here because the oracle gate demands exactness."""
    orders = cat(spark, sf_dir)["orders"]
    return orders.groupBy("o_orderpriority").agg(
        money(F.expr("percentile(o_totalprice, 0.5)")).alias("p50"),
        money(F.expr("percentile(o_totalprice, 0.9)")).alias("p90"),
        money(F.expr("percentile(o_totalprice, 0.99)")).alias("p99"),
    )


@query(
    "stat_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bucket,
           COUNT(*) AS n, FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total
    FROM events GROUP BY 1
    """,
)
def stat_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucketing is a narrow map, one shuffle."""
    ev = cat(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.floor(F.col("value") / 10).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum("value")).alias("total"))
    )


@query(
    "stat_corr",
    oracle="""
    SELECT FLOOR((corr(l_quantity, l_extendedprice)) * 1000 + 0.5) / 1000 AS corr_qty_price,
           FLOOR((covar_samp(l_quantity, l_extendedprice)) * 10 + 0.5) / 10 AS covar_qty_price,
           FLOOR((stddev_samp(l_quantity)) * 1000 + 0.5) / 1000 AS sd_qty
    FROM lineitem
    """,
)
def stat_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = cat(spark, sf_dir)["lineitem"]
    return li.agg(
        rnd(F.corr("l_quantity", "l_extendedprice"), 3).alias("corr_qty_price"),
        rnd(F.covar_samp("l_quantity", "l_extendedprice"), 1).alias("covar_qty_price"),
        rnd(F.stddev_samp("l_quantity"), 3).alias("sd_qty"),
    )
