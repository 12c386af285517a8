"""Statistical aggregates: exact percentiles, histograms, correlation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money
from mister_spark.registry import query


@query(
    "stat_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
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
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
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
    SELECT ROUND(corr(l_quantity, l_extendedprice), 3) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 1) AS covar_qty_price,
           ROUND(stddev_samp(l_quantity), 3) AS sd_qty
    FROM lineitem
    """,
)
def stat_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = cat(spark, sf_dir)["lineitem"]
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 3).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 1).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 3).alias("sd_qty"),
    )
