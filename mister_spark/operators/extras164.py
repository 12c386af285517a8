"""Wave 164: safety stock and economic order quantity.

ds_safety_stock combines demand variability AND lead-time
variability into the classic z·sqrt(LT·sigma_d^2 + d^2·sigma_LT^2)
buffer — the formula that explains why erratic suppliers cost more
inventory than erratic customers; ds_eoq is the square-root-law
order quantity, turning measured annual demand into lot size,
order frequency, and total ordering+holding cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SS_Z = 1.645  # 95% cycle service level
EOQ_ORDER_COST = 75.0  # $ per order placed
EOQ_HOLD_RATE = 0.25  # holding cost as a fraction of unit value / yr
EOQ_TOP = 8


@query(
    "ds_safety_stock",
    oracle=f"""
    WITH lt AS (SELECT l.l_suppkey AS k,
                       CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                            AS DOUBLE) AS lt_days,
                       CAST(l.l_quantity AS DOUBLE) AS q
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey),
    d AS (SELECT l_shipdate AS day, SUM(l_quantity) AS dq
          FROM lineitem GROUP BY 1),
    dm AS (SELECT AVG(dq) AS d_mean, STDDEV_POP(dq) AS d_sd FROM d),
    lm AS (SELECT AVG(lt_days) AS lt_mean, STDDEV_POP(lt_days) AS lt_sd
           FROM lt)
    SELECT FLOOR(dm.d_mean * 100 + 0.5) / 100 AS daily_demand,
           FLOOR(lm.lt_mean * 100 + 0.5) / 100 AS lead_time_days,
           FLOOR({SS_Z} * SQRT(lm.lt_mean * dm.d_sd * dm.d_sd
                               + dm.d_mean * dm.d_mean
                                 * lm.lt_sd * lm.lt_sd)
                 * 100 + 0.5) / 100 AS safety_stock,
           FLOOR({SS_Z} * SQRT(lm.lt_mean) * dm.d_sd * 100 + 0.5) / 100
             AS demand_only_stock,
           FLOOR(dm.d_mean * lm.lt_mean * 100 + 0.5) / 100
             AS cycle_stock
    FROM dm, lm
    """,
)
def ds_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock with BOTH uncertainty sources: z·sqrt(LT·σ_d² +
    d̄²·σ_LT²) at z={z} — lead-time measured as orderdate→shipdate,
    demand as daily shipped quantity. The demand-only column shows
    what the formula misses when lead-time variance is ignored (here
    the lead-time term dominates: σ_LT ≈ 30 days on a d̄ of
    thousands of units). Reorder point = cycle stock + safety stock.

    Scale: two independent moment aggregates (one joined pass for
    lead times, one day rollup for demand) — no windows at all."""
    c = cat(spark, sf_dir)
    lt = (
        c["lineitem"]
        .join(
            c["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.datediff("l_shipdate", "o_orderdate")
            .cast("double")
            .alias("lt_days")
        )
    )
    d = c["lineitem"].groupBy("l_shipdate").agg(
        F.sum("l_quantity").alias("dq")
    )
    dm = d.agg(
        F.avg("dq").alias("d_mean"), F.stddev_pop("dq").alias("d_sd")
    )
    lm = lt.agg(
        F.avg("lt_days").alias("lt_mean"),
        F.stddev_pop("lt_days").alias("lt_sd"),
    )
    j = dm.crossJoin(F.broadcast(lm))
    ss = SS_Z * F.sqrt(
        F.col("lt_mean") * F.col("d_sd") * F.col("d_sd")
        + F.col("d_mean")
        * F.col("d_mean")
        * F.col("lt_sd")
        * F.col("lt_sd")
    )
    return j.select(
        (F.floor(F.col("d_mean") * 100 + 0.5) / 100).alias(
            "daily_demand"
        ),
        (F.floor(F.col("lt_mean") * 100 + 0.5) / 100).alias(
            "lead_time_days"
        ),
        (F.floor(ss * 100 + 0.5) / 100).alias("safety_stock"),
        (
            F.floor(
                SS_Z * F.sqrt(F.col("lt_mean")) * F.col("d_sd") * 100
                + 0.5
            )
            / 100
        ).alias("demand_only_stock"),
        (
            F.floor(F.col("d_mean") * F.col("lt_mean") * 100 + 0.5)
            / 100
        ).alias("cycle_stock"),
    )


ds_safety_stock.__doc__ = ds_safety_stock.__doc__.format(z=SS_Z)


@query(
    "ds_eoq",
    oracle=f"""
    WITH yr AS (SELECT CAST(COUNT(DISTINCT EXTRACT(year FROM l_shipdate))
                            AS DOUBLE) AS years
                FROM lineitem),
    b AS (SELECT p.p_brand AS brand,
                 SUM(l.l_quantity) / yr.years AS annual_d,
                 SUM(l.l_extendedprice) / SUM(l.l_quantity) AS unit_cost
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey,
               yr
          GROUP BY 1, yr.years),
    e AS (SELECT brand, annual_d, unit_cost,
                 SQRT(2 * annual_d * {EOQ_ORDER_COST}
                      / (unit_cost * {EOQ_HOLD_RATE})) AS eoq
          FROM b)
    SELECT brand,
           FLOOR(annual_d * 100 + 0.5) / 100 AS annual_demand,
           FLOOR(eoq * 100 + 0.5) / 100 AS eoq_units,
           FLOOR(annual_d / eoq * 100 + 0.5) / 100 AS orders_per_year,
           FLOOR(SQRT(2 * annual_d * {EOQ_ORDER_COST}
                      * unit_cost * {EOQ_HOLD_RATE}) * 100 + 0.5) / 100
             AS annual_oh_cost
    FROM e
    ORDER BY FLOOR(annual_d * 100 + 0.5) / 100 DESC, brand
    LIMIT {EOQ_TOP}
    """,
)
def ds_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand: EOQ = sqrt(2·D·S/H) with
    measured annual demand D and unit cost (H = {h:.0%} of unit
    value, S = ${s:.0f}/order), plus the implied order cadence and
    the optimal total ordering+holding cost sqrt(2·D·S·H) — the
    square-root law: 4× the demand only doubles the lot size.

    Scale: brand rollup joins the broadcast part dim; everything
    after is |brands|-row closed form and a top-{k}."""
    c = cat(spark, sf_dir)
    yr = c["lineitem"].agg(
        F.countDistinct(F.year("l_shipdate"))
        .cast("double")
        .alias("years")
    )
    b = (
        c["lineitem"]
        .join(
            F.broadcast(c["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("l_quantity").alias("tq"),
            F.sum("l_extendedprice").alias("tp"),
        )
        .crossJoin(F.broadcast(yr))
        .select(
            "brand",
            (F.col("tq") / F.col("years")).alias("annual_d"),
            (F.col("tp") / F.col("tq")).alias("unit_cost"),
        )
    )
    eoq = F.sqrt(
        2 * F.col("annual_d") * EOQ_ORDER_COST
        / (F.col("unit_cost") * EOQ_HOLD_RATE)
    )
    return (
        b.select(
            "brand",
            (F.floor(F.col("annual_d") * 100 + 0.5) / 100).alias(
                "annual_demand"
            ),
            (F.floor(eoq * 100 + 0.5) / 100).alias("eoq_units"),
            (
                F.floor(F.col("annual_d") / eoq * 100 + 0.5) / 100
            ).alias("orders_per_year"),
            (
                F.floor(
                    F.sqrt(
                        2
                        * F.col("annual_d")
                        * EOQ_ORDER_COST
                        * F.col("unit_cost")
                        * EOQ_HOLD_RATE
                    )
                    * 100
                    + 0.5
                )
                / 100
            ).alias("annual_oh_cost"),
        )
        .orderBy(F.col("annual_demand").desc(), "brand")
        .limit(EOQ_TOP)
    )


ds_eoq.__doc__ = ds_eoq.__doc__.format(
    h=EOQ_HOLD_RATE, s=EOQ_ORDER_COST, k=EOQ_TOP
)
