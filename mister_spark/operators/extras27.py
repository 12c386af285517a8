"""Wave 27: calendar-hierarchy rollups and extreme-value return levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, rnd
from mister_spark.registry import query

EULER_GAMMA = 0.5772156649015329
SQRT6_OVER_PI = 0.7796968012336793  # √6/π


@query(
    "agg_time_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(date_part('year', o_orderdate)) = 1 THEN -1
                ELSE CAST(date_part('year', o_orderdate) AS BIGINT) END AS year,
           CASE WHEN GROUPING(date_part('month', o_orderdate)) = 1 THEN -1
                ELSE CAST(date_part('month', o_orderdate) AS BIGINT) END AS month,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders
    GROUP BY ROLLUP (date_part('year', o_orderdate),
                     date_part('month', o_orderdate))
    """,
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup: order revenue at month, year, and
    grand-total grain in ONE pass (ROLLUP over the derived year/month
    columns; NULL grouping slots surfaced as −1 so the output stays
    integer-typed cross-engine). The time twin of agg_rollup's
    region→nation hierarchy — every dashboard's date drill-down.

    Scale: rollup plans a single shuffle with partial aggregation at
    the finest grain; coarser grains fold from it, never rescan."""
    o = cat(spark, sf_dir)["orders"]
    year = F.year("o_orderdate").cast("long")
    month = F.month("o_orderdate").cast("long")
    g = o.rollup(year.alias("y"), month.alias("m")).agg(
        F.count(F.lit(1)).alias("n"), money(F.sum("o_totalprice")).alias("total")
    )
    return g.select(
        F.coalesce(F.col("y"), F.lit(-1)).alias("year"),
        F.coalesce(F.col("m"), F.lit(-1)).alias("month"),
        "n",
        "total",
    )


@query(
    "stat_extreme_value",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             MAX(value) AS block_max
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             AVG(block_max) AS mu,
             SUM(block_max * block_max) AS s2, SUM(block_max) AS s
      FROM daily GROUP BY 1),
    fit AS (
      SELECT event_type, n_blocks, mu,
             {SQRT6_OVER_PI} * SQRT((s2 - s * s / n_blocks) / n_blocks)
               AS scale
      FROM m)
    SELECT event_type, n_blocks,
           FLOOR((mu - {EULER_GAMMA} * scale) * 10000 + 0.5) / 10000 AS gumbel_loc,
           FLOOR(scale * 10000 + 0.5) / 10000 AS gumbel_scale,
           FLOOR((mu - {EULER_GAMMA} * scale
                  - scale * LN(-LN(1 - 1.0 / 100))) * 10000 + 0.5) / 10000
             AS return_level_100
    FROM fit
    """,
)
def stat_extreme_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily block maxima per event type:
    Gumbel location/scale by the method of moments (scale = √6·σ/π,
    loc = μ − γ·scale) and the 100-day return level — 'the largest
    value we should expect once per hundred days', the capacity-
    planning number percentiles can't give because it extrapolates
    BEYOND the observed quantiles.

    Scale: one (type, day) block-max rollup, then moment algebra on
    the ≤ #days frame per type. The constants are literals shared with
    the oracle."""
    ev = cat(spark, sf_dir)["events"]
    daily = (
        ev.repartition("event_type")
        .groupBy("event_type", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.max("value").alias("block_max"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.avg("block_max").alias("mu"),
        F.sum(F.col("block_max") * F.col("block_max")).alias("s2"),
        F.sum("block_max").alias("s"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n_blocks")) / F.col(
        "n_blocks"
    )
    scale = SQRT6_OVER_PI * F.sqrt(var)
    loc = F.col("mu") - EULER_GAMMA * scale
    import math

    rl_factor = -math.log(-math.log(1 - 1.0 / 100))
    return m.select(
        "event_type",
        "n_blocks",
        rnd(loc, 4).alias("gumbel_loc"),
        rnd(scale, 4).alias("gumbel_scale"),
        rnd(loc + scale * rl_factor, 4).alias("return_level_100"),
    )
