"""Wave 167: price-volume-mix bridge and supplier scorecards.

fin_pvm_bridge decomposes the year-over-year revenue change per
brand into price, volume, and cross effects that reconcile EXACTLY
to the total delta — the FP&A waterfall that answers 'did we sell
more, or just charge more?'; ds_vendor_scorecard rolls each
supplier's measured lead time and on-time share into the ranked
scorecard a procurement review runs on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

PVM_Y0 = 1995
PVM_Y1 = 1996
PVM_TOP = 8
VS_ONTIME_DAYS = 60
VS_TOP = 10


@query(
    "fin_pvm_bridge",
    oracle=f"""
    WITH by AS (SELECT p.p_brand AS brand,
                       EXTRACT(year FROM l.l_shipdate) AS yr,
                       SUM(l.l_extendedprice) / SUM(l.l_quantity) AS p,
                       SUM(l.l_quantity) AS q
                FROM lineitem l JOIN part p
                  ON l.l_partkey = p.p_partkey
                WHERE EXTRACT(year FROM l.l_shipdate)
                        IN ({PVM_Y0}, {PVM_Y1})
                GROUP BY 1, 2),
    b AS (SELECT a.brand, a.p AS p0, a.q AS q0, c.p AS p1, c.q AS q1
          FROM by a JOIN by c ON a.brand = c.brand
          WHERE a.yr = {PVM_Y0} AND c.yr = {PVM_Y1})
    SELECT brand,
           FLOOR((p1 * q1 - p0 * q0) * 100 + 0.5) / 100 AS delta_rev,
           FLOOR((p1 - p0) * q0 * 100 + 0.5) / 100 AS price_effect,
           FLOOR(p0 * (q1 - q0) * 100 + 0.5) / 100 AS volume_effect,
           FLOOR((p1 - p0) * (q1 - q0) * 100 + 0.5) / 100
             AS cross_effect
    FROM b
    ORDER BY FLOOR(ABS(p1 * q1 - p0 * q0) * 100 + 0.5) / 100 DESC,
             brand
    LIMIT {PVM_TOP}
    """,
)
def fin_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge {y0}→{y1} per brand: Δrev =
    Δp·q₀ (price) + p₀·Δq (volume) + Δp·Δq (cross) — an EXACT
    algebraic decomposition (the three effects reconcile to the
    delta, asserted in tests), not an attribution heuristic. Ranked
    by absolute revenue swing: the waterfall's biggest bars first.

    Scale: one (brand, year) rollup behind a broadcast part join;
    the bridge itself is |brands|-row arithmetic."""
    c = cat(spark, sf_dir)
    by = (
        c["lineitem"]
        .filter(F.year("l_shipdate").isin(PVM_Y0, PVM_Y1))
        .join(
            F.broadcast(c["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias(
                "p"
            ),
            F.sum("l_quantity").alias("q"),
        )
    )
    y0 = by.filter(F.col("yr") == PVM_Y0).select(
        "brand", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    y1 = by.filter(F.col("yr") == PVM_Y1).select(
        "brand", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    b = y0.join(y1, "brand")
    dr = F.col("p1") * F.col("q1") - F.col("p0") * F.col("q0")
    return (
        b.select(
            "brand",
            money(dr).alias("delta_rev"),
            money((F.col("p1") - F.col("p0")) * F.col("q0")).alias(
                "price_effect"
            ),
            money(F.col("p0") * (F.col("q1") - F.col("q0"))).alias(
                "volume_effect"
            ),
            money(
                (F.col("p1") - F.col("p0"))
                * (F.col("q1") - F.col("q0"))
            ).alias("cross_effect"),
            money(F.abs(dr)).alias("_a"),
        )
        .orderBy(F.col("_a").desc(), "brand")
        .limit(PVM_TOP)
        .drop("_a")
    )


fin_pvm_bridge.__doc__ = fin_pvm_bridge.__doc__.format(
    y0=PVM_Y0, y1=PVM_Y1
)


@query(
    "ds_vendor_scorecard",
    oracle=f"""
    WITH lt AS (SELECT l.l_suppkey AS sk,
                       CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                            AS DOUBLE) AS lt_days,
                       l.l_extendedprice * (1 - l.l_discount) AS rev
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey),
    sc AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS lines,
                  AVG(lt_days) AS lead_avg,
                  SUM(CASE WHEN lt_days <= {VS_ONTIME_DAYS}
                           THEN 1.0 ELSE 0 END) / COUNT(*) AS ontime,
                  SUM(rev) AS rev
           FROM lt GROUP BY 1)
    SELECT s.s_name AS supplier, sc.lines,
           FLOOR(sc.lead_avg * 100 + 0.5) / 100 AS avg_lead_days,
           FLOOR(sc.ontime * 10000 + 0.5) / 10000 AS ontime_share,
           FLOOR(sc.rev * 100 + 0.5) / 100 AS revenue
    FROM sc JOIN supplier s ON sc.sk = s.s_suppkey
    ORDER BY FLOOR(sc.rev * 100 + 0.5) / 100 DESC, s.s_name
    LIMIT {VS_TOP}
    """,
)
def ds_vendor_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: measured order→ship lead time, the share
    of lines landed within {d} days ('on-time'), and discounted
    revenue, for the top-{k} suppliers by spend — lead-time facts
    from the fact-to-fact orderkey join, names from the broadcast
    supplier dim. The table a quarterly vendor review sorts by.

    Scale: lineitem⋈orders co-partitions on orderkey; the supplier
    rollup is one shuffle and the dim join broadcasts."""
    c = cat(spark, sf_dir)
    lt = (
        c["lineitem"]
        .join(
            c["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("sk"),
            F.datediff("l_shipdate", "o_orderdate")
            .cast("double")
            .alias("lt_days"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
        )
    )
    sc = lt.groupBy("sk").agg(
        F.count(F.lit(1)).cast("bigint").alias("lines"),
        F.avg("lt_days").alias("lead_avg"),
        (
            F.sum(
                F.when(
                    F.col("lt_days") <= VS_ONTIME_DAYS, 1.0
                ).otherwise(0.0)
            )
            / F.count(F.lit(1))
        ).alias("ontime"),
        F.sum("rev").alias("rev"),
    )
    return (
        sc.join(
            F.broadcast(
                c["supplier"].select("s_suppkey", "s_name")
            ),
            F.col("sk") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_name").alias("supplier"),
            "lines",
            (F.floor(F.col("lead_avg") * 100 + 0.5) / 100).alias(
                "avg_lead_days"
            ),
            ratio(F.col("ontime")).alias("ontime_share"),
            money(F.col("rev")).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "supplier")
        .limit(VS_TOP)
    )


ds_vendor_scorecard.__doc__ = ds_vendor_scorecard.__doc__.format(
    d=VS_ONTIME_DAYS, k=VS_TOP
)
