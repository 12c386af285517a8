"""Wave 144: partitioning-strategy comparison and datetime surface
parity.

mr_partition_strategies measures actual rows-per-partition balance
under hash, range, and round-robin repartitioning of the same frame
— the empirical answer to 'which repartition do I want before this
write'; sql_datetime_suite pins the datetime expression family
(interval arithmetic, month addition, truncation, extraction)
against DuckDB — calendar arithmetic is the other classic
cross-engine divergence source after regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PS_PARTS = 16


@query("mr_partition_strategies")  # physical introspection → rows-only
def mr_partition_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning-strategy balance comparison: the same lineitem
    frame repartitioned {p} ways by (a) hash on orderkey, (b) RANGE
    on orderkey, (c) round-robin — actual rows per physical partition
    measured for each. Round-robin is perfectly level (the write-
    balancing choice), hash is level in expectation (the join
    co-location choice), range preserves order locality at the price
    of boundary skew (the sorted-write choice). Numbers, not
    folklore.

    Scale: three repartitions of one projection; the balance profile
    is a {p}-row rollup each."""
    li = cat(spark, sf_dir)["lineitem"].select("l_orderkey")
    variants = {
        "hash": li.repartition(PS_PARTS, "l_orderkey"),
        "range": li.repartitionByRange(PS_PARTS, "l_orderkey"),
        "round_robin": li.repartition(PS_PARTS),
    }
    rows = []
    for name, df in variants.items():
        per = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).cast("double").alias("n"))
        )
        s = per.agg(
            F.count(F.lit(1)).alias("parts"),
            F.max("n").alias("mx"),
            F.avg("n").alias("avg"),
            F.stddev_samp("n").alias("sd"),
        ).collect()[0]
        rows.append(
            (
                name,
                int(s["parts"]),
                round(float(s["mx"] / s["avg"]), 4),
                round(float((s["sd"] or 0.0) / s["avg"]), 4),
            )
        )
    return spark.createDataFrame(
        rows, "strategy string, partitions long, max_over_mean double, "
        "cv double"
    )


mr_partition_strategies.__doc__ = mr_partition_strategies.__doc__.format(
    p=PS_PARTS
)


@query(
    "sql_datetime_suite",
    oracle="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS dt FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN dt + INTERVAL 30 DAY
                              > CAST(dt AS DATE) + INTERVAL 1 MONTH
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS thirty_gt_month,
           CAST(SUM(EXTRACT(quarter FROM dt)) AS BIGINT) AS quarter_sum,
           CAST(COUNT(DISTINCT date_trunc('week', dt)) AS BIGINT)
             AS distinct_weeks,
           CAST(SUM(CASE WHEN last_day(dt) = dt THEN 1 ELSE 0 END)
                AS BIGINT) AS month_end_orders
    FROM d
    """,
)
def sql_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface parity: interval arithmetic (does +30 days
    overshoot +1 month? — yes in Feb/Apr/Jun/Sep/Nov), quarter
    extraction, ISO week truncation, and month-end detection — the
    calendar-arithmetic subset proven identical across engines.
    Calendar math diverges silently across systems (month-add
    clamping, week-start conventions); this pins the shared
    behavior.

    Scale: narrow expressions over one scan; one aggregate."""
    d = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderdate").cast("date").alias("dt")
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (
                F.date_add(F.col("dt"), 30)
                > F.add_months(F.col("dt"), 1)
            ).cast("long")
        )
        .cast("bigint")
        .alias("thirty_gt_month"),
        F.sum(F.quarter("dt")).cast("bigint").alias("quarter_sum"),
        F.countDistinct(F.date_trunc("week", "dt"))
        .cast("bigint")
        .alias("distinct_weeks"),
        F.sum((F.last_day("dt") == F.col("dt")).cast("long"))
        .cast("bigint")
        .alias("month_end_orders"),
    )
