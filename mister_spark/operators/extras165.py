"""Wave 165: price indices and realized-discount distributions.

fin_price_index computes the Laspeyres, Paasche, and Fisher price
indices between two years over the common-part basket — the
index-number trio (base-weighted overstates, current-weighted
understates, Fisher splits the difference geometrically) behind
every inflation figure; fin_discount_depth profiles how far
realized line prices sit under list price by brand — the
realized-margin lens merchandising actually manages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PI_Y0 = 1995
PI_Y1 = 1996
DISC_TOP = 8


@query(
    "fin_price_index",
    oracle=f"""
    WITH py AS (SELECT l_partkey AS pk,
                       EXTRACT(year FROM l_shipdate) AS yr,
                       SUM(l_extendedprice) / SUM(l_quantity) AS p,
                       SUM(l_quantity) AS q
                FROM lineitem
                WHERE EXTRACT(year FROM l_shipdate)
                        IN ({PI_Y0}, {PI_Y1})
                GROUP BY 1, 2),
    b AS (SELECT a.pk, a.p AS p0, a.q AS q0, c.p AS p1, c.q AS q1
          FROM py a JOIN py c ON a.pk = c.pk
          WHERE a.yr = {PI_Y0} AND c.yr = {PI_Y1}),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS parts,
                 SUM(p1 * q0) / SUM(p0 * q0) AS lasp,
                 SUM(p1 * q1) / SUM(p0 * q1) AS paas
          FROM b)
    SELECT CAST(parts AS BIGINT) AS basket_parts,
           FLOOR(lasp * 10000 + 0.5) / 10000 AS laspeyres,
           FLOOR(paas * 10000 + 0.5) / 10000 AS paasche,
           FLOOR(SQRT(lasp * paas) * 10000 + 0.5) / 10000 AS fisher
    FROM s
    """,
)
def fin_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices {y0}→{y1} over the
    parts traded in BOTH years (unit price = revenue/quantity per
    part-year): Laspeyres weights by the base basket, Paasche by the
    current one, Fisher is their geometric mean — the 'ideal' index
    that cancels the two substitution biases. Near 1.0 on TPC-H's
    stationary prices; the machinery is the point.

    Scale: one (part, year) rollup, a self-join on partkey (both
    sides pre-aggregated to part grain), and a one-row sum."""
    li = cat(spark, sf_dir)["lineitem"]
    py = (
        li.filter(F.year("l_shipdate").isin(PI_Y0, PI_Y1))
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias(
                "p"
            ),
            F.sum("l_quantity").alias("q"),
        )
    )
    y0 = py.filter(F.col("yr") == PI_Y0).select(
        "pk", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    y1 = py.filter(F.col("yr") == PI_Y1).select(
        "pk", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    s = y0.join(y1, "pk").agg(
        F.count(F.lit(1)).cast("double").alias("parts"),
        (
            F.sum(F.col("p1") * F.col("q0"))
            / F.sum(F.col("p0") * F.col("q0"))
        ).alias("lasp"),
        (
            F.sum(F.col("p1") * F.col("q1"))
            / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paas"),
    )
    return s.select(
        F.col("parts").cast("bigint").alias("basket_parts"),
        ratio(F.col("lasp")).alias("laspeyres"),
        ratio(F.col("paas")).alias("paasche"),
        ratio(F.sqrt(F.col("lasp") * F.col("paas"))).alias("fisher"),
    )


fin_price_index.__doc__ = fin_price_index.__doc__.format(
    y0=PI_Y0, y1=PI_Y1
)


@query(
    "fin_discount_depth",
    oracle=f"""
    WITH d AS (SELECT p.p_brand AS brand, l.l_discount AS disc,
                      l.l_extendedprice * l.l_discount AS given
               FROM lineitem l JOIN part p
                 ON l.l_partkey = p.p_partkey)
    SELECT brand,
           FLOOR(AVG(disc) * 10000 + 0.5) / 10000 AS avg_discount,
           FLOOR(SUM(CASE WHEN disc >= 0.05 THEN 1 ELSE 0 END)
                 * 10000.0 / COUNT(*) + 0.5) / 10000 AS deep_share,
           FLOOR(SUM(given) * 100 + 0.5) / 100 AS discount_dollars
    FROM d GROUP BY 1
    ORDER BY FLOOR(SUM(given) * 100 + 0.5) / 100 DESC, brand
    LIMIT {DISC_TOP}
    """,
)
def fin_discount_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth profile by brand: average realized discount,
    the share of lines discounted ≥5% ('deep'), and the dollars
    given away — ranked by dollars, which is the number a pricing
    review opens with (depth × volume, not depth alone). Uniform
    TPC-H discounts make brands nearly identical: a flat profile
    here is the calibrated no-op baseline.

    Scale: broadcast part-dim join; one brand rollup; top-{k}."""
    c = cat(spark, sf_dir)
    d = (
        c["lineitem"]
        .join(
            F.broadcast(c["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_discount").alias("disc"),
            (F.col("l_extendedprice") * F.col("l_discount")).alias(
                "given"
            ),
        )
    )
    return (
        d.groupBy("brand")
        .agg(
            ratio(F.avg("disc")).alias("avg_discount"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("disc") >= 0.05, 1).otherwise(0)
                    )
                    * 10000.0
                    / F.count(F.lit(1))
                    + 0.5
                )
                / 10000
            ).alias("deep_share"),
            (F.floor(F.sum("given") * 100 + 0.5) / 100).alias(
                "discount_dollars"
            ),
        )
        .orderBy(F.col("discount_dollars").desc(), "brand")
        .limit(DISC_TOP)
    )


fin_discount_depth.__doc__ = fin_discount_depth.__doc__.format(
    k=DISC_TOP
)
