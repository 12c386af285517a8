"""Wave 176: Cochran's Q and trading-day adjustment.

stat_cochran_q asks whether the SAME customers' yearly activity
rates differ across years — the k-treatment McNemar, where
between-customer variation cancels by the matched design and only
one customer-grain rollup plus a five-moment aggregate remains. ev_trading_day_adjust removes the
weekday-composition artifact from monthly revenue — a month with five
Fridays books more than its calendar share — the trading-day
correction every X-11-style seasonal adjustment applies first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "stat_cochran_q",
    oracle="""
    WITH f AS (SELECT o_custkey AS ck,
                      MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                               THEN 1 ELSE 0 END) AS y1,
                      MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                               THEN 1 ELSE 0 END) AS y2,
                      MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                               THEN 1 ELSE 0 END) AS y3
               FROM orders GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(y1) AS g1, SUM(y2) AS g2, SUM(y3) AS g3,
                 SUM(y1 + y2 + y3) AS sl,
                 SUM((y1 + y2 + y3) * (y1 + y2 + y3)) AS sl2
          FROM f),
    q AS (SELECT n, g1, g2, g3,
                 3 * 2 * ((g1 - sl / 3) * (g1 - sl / 3)
                          + (g2 - sl / 3) * (g2 - sl / 3)
                          + (g3 - sl / 3) * (g3 - sl / 3))
                 / (3 * sl - sl2) AS qstat
          FROM s)
    SELECT CAST(n AS BIGINT) AS customers,
           CAST(g1 AS BIGINT) AS active_1995,
           CAST(g2 AS BIGINT) AS active_1996,
           CAST(g3 AS BIGINT) AS active_1997,
           FLOOR(qstat * 10000 + 0.5) / 10000 AS q_stat,
           CASE WHEN qstat > 5.991465 THEN 1 ELSE 0 END AS reject_5pct
    FROM q
    """,
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q on matched binary outcomes: per customer, the
    was-active flag in each of 1995/1996/1997 — the k-treatment
    generalization of McNemar that asks whether activity RATES differ
    across years within the SAME customers (between-customer
    variation cancels by design). Q = k(k-1) sum_j (G_j - mean)^2 /
    (k*sum L_i - sum L_i^2), chi-square with k-1 dof; the 5% decision
    against the exact 5.9915 critical value ships with the counts.

    Scale: one customer-grain rollup with three conditional MAX
    flags, then a single five-moment aggregate — the test is O(1)
    after one shuffle."""
    o = cat(spark, sf_dir)["orders"]
    yr = F.year("o_orderdate")
    f = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.when(yr == 1995, 1).otherwise(0)).alias("y1"),
        F.max(F.when(yr == 1996, 1).otherwise(0)).alias("y2"),
        F.max(F.when(yr == 1997, 1).otherwise(0)).alias("y3"),
    )
    L = F.col("y1") + F.col("y2") + F.col("y3")
    s = f.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y1").alias("g1"),
        F.sum("y2").alias("g2"),
        F.sum("y3").alias("g3"),
        F.sum(L).alias("sl"),
        F.sum(L * L).alias("sl2"),
    )
    mean_g = F.col("sl") / 3
    qstat = (
        3
        * 2
        * (
            (F.col("g1") - mean_g) * (F.col("g1") - mean_g)
            + (F.col("g2") - mean_g) * (F.col("g2") - mean_g)
            + (F.col("g3") - mean_g) * (F.col("g3") - mean_g)
        )
        / (3 * F.col("sl") - F.col("sl2"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("customers"),
        F.col("g1").cast("bigint").alias("active_1995"),
        F.col("g2").cast("bigint").alias("active_1996"),
        F.col("g3").cast("bigint").alias("active_1997"),
        ratio(qstat).alias("q_stat"),
        F.when(qstat > 5.991465, 1).otherwise(0).alias("reject_5pct"),
    )


@query(
    "ev_trading_day_adjust",
    oracle="""
    WITH d AS (SELECT o_orderdate AS day,
                      EXTRACT(dow FROM o_orderdate) AS dow,
                      strftime(o_orderdate, '%Y-%m') AS month,
                      SUM(o_totalprice) AS rev
               FROM orders GROUP BY 1, 2, 3),
    dw AS (SELECT dow, SUM(rev) / COUNT(*) AS day_rate FROM d
           GROUP BY 1),
    mo AS (SELECT month, SUM(rev) AS actual,
                  CAST(COUNT(*) AS BIGINT) AS days
           FROM d GROUP BY 1),
    ex AS (SELECT d.month, SUM(dw.day_rate) AS expected
           FROM d JOIN dw ON d.dow = dw.dow GROUP BY 1)
    SELECT mo.month, mo.days,
           FLOOR(mo.actual * 100 + 0.5) / 100 AS actual_rev,
           FLOOR(ex.expected * 100 + 0.5) / 100 AS expected_rev,
           FLOOR(mo.actual / ex.expected * 10000 + 0.5) / 10000
             AS td_adjusted_index
    FROM mo JOIN ex ON mo.month = ex.month
    ORDER BY 1
    """,
)
def ev_trading_day_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trading-day adjustment of monthly order revenue: each month's
    EXPECTED revenue is the sum over its actual calendar days of the
    global per-weekday mean daily revenue, and the adjusted index is
    actual/expected — above 1 means the month out-earned its weekday
    composition, the signal left after the five-Fridays artifact is
    removed. The first correction in any X-11-style seasonal
    decomposition.

    Scale: one (day, dow, month) rollup; the 7-row weekday-rate table
    broadcasts back over the day frame; months aggregate a
    calendar-bounded frame."""
    o = cat(spark, sf_dir)["orders"]
    # DuckDB EXTRACT(dow) is 0=Sunday; Spark dayofweek is 1=Sunday
    d = o.groupBy(
        F.col("o_orderdate").alias("day"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(F.sum("o_totalprice").alias("rev")).localCheckpoint()
    # ^ calendar-bounded (one row per day); read by 3 branches
    dw = d.groupBy("dow").agg(
        (F.sum("rev") / F.count(F.lit(1))).alias("day_rate")
    )
    mo = d.groupBy("month").agg(
        F.sum("rev").alias("actual"),
        F.count(F.lit(1)).cast("bigint").alias("days"),
    )
    ex = (
        d.join(F.broadcast(dw), "dow")
        .groupBy("month")
        .agg(F.sum("day_rate").alias("expected"))
    )
    money2 = lambda c: F.floor(c * 100 + 0.5) / 100  # noqa: E731
    return (
        mo.join(ex, "month")
        .select(
            "month",
            "days",
            money2(F.col("actual")).alias("actual_rev"),
            money2(F.col("expected")).alias("expected_rev"),
            ratio(F.col("actual") / F.col("expected")).alias(
                "td_adjusted_index"
            ),
        )
        .orderBy("month")
    )
