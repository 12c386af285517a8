"""Wave 182: hierarchical forecast reconciliation.

ev_hts_reconcile exercises the region > nation revenue hierarchy with
a NONLINEAR base forecaster (growth-rate extrapolation — linear
methods like naive/drift aggregate identically, so reconciliation
would be vacuous): nation-level and region-level forecasts disagree
after aggregation, and the op quantifies the coherence gap plus the
accuracy of the two classic reconciliation strategies — bottom-up
(sum child forecasts) and top-down (disaggregate the parent forecast
by historical shares) — against the held-out year's actuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query

HTS_Y0, HTS_Y1, HTS_Y2 = 1996, 1997, 1998  # growth base, last obs, held-out


@query(
    "ev_hts_reconcile",
    oracle=f"""
    WITH cy AS (SELECT r.r_name AS region, n.n_name AS nation,
                       EXTRACT(year FROM o.o_orderdate) AS yr,
                       SUM(o.o_totalprice) AS rev
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE EXTRACT(year FROM o.o_orderdate)
                        IN ({HTS_Y0}, {HTS_Y1}, {HTS_Y2})
                GROUP BY 1, 2, 3),
    nat AS (SELECT region, nation,
                   SUM(CASE WHEN yr = 1996 THEN rev END) AS r0,
                   SUM(CASE WHEN yr = 1997 THEN rev END) AS r1,
                   SUM(CASE WHEN yr = 1998 THEN rev END) AS r2
            FROM cy GROUP BY 1, 2),
    f AS (SELECT region, nation, r0, r1, r2,
                 r1 * r1 / r0 AS fc_nat
          FROM nat WHERE r0 > 0 AND r1 > 0 AND r2 > 0),
    reg AS (SELECT region, CAST(COUNT(*) AS BIGINT) AS nations,
                   SUM(r0) AS reg_r0, SUM(r1) AS reg_r1,
                   SUM(r2) AS reg_r2, SUM(fc_nat) AS fc_bu
            FROM f GROUP BY 1),
    regx AS (SELECT *, reg_r1 * reg_r1 / reg_r0 AS fc_direct FROM reg),
    ev AS (SELECT f.region,
                  SUM(ABS(f.fc_nat - f.r2)) / COUNT(*) AS bu_nat_mae,
                  SUM(ABS(rx.fc_direct * f.r1 / rx.reg_r1 - f.r2))
                    / COUNT(*) AS td_nat_mae
           FROM f JOIN regx rx ON f.region = rx.region GROUP BY 1)
    SELECT regx.region, nations,
           FLOOR(reg_r2 * 100 + 0.5) / 100 AS actual,
           FLOOR(fc_direct * 100 + 0.5) / 100 AS fc_direct,
           FLOOR(fc_bu * 100 + 0.5) / 100 AS fc_bottom_up,
           FLOOR((fc_direct - fc_bu) * 100 + 0.5) / 100
             AS coherence_gap,
           FLOOR(bu_nat_mae * 100 + 0.5) / 100 AS bu_nation_mae,
           FLOOR(td_nat_mae * 100 + 0.5) / 100 AS td_nation_mae
    FROM regx JOIN ev ON regx.region = ev.region ORDER BY 1
    """,
)
def ev_hts_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical reconciliation over region > nation revenue with a
    growth-rate base forecast fc = r_{y1}^2 / r_{y0} (nonlinear, so
    forecasting at the nation level and summing does NOT equal
    forecasting the region directly): per region, the direct forecast,
    the bottom-up sum, their coherence gap, and the nation-level MAE
    of bottom-up vs top-down (direct region forecast disaggregated by
    last-year nation shares) against the held-out year. The standard
    evidence table for choosing a reconciliation strategy.

    Scale: one (region, nation, year) rollup; everything downstream
    runs on the 25-nation frame (model-sized); held-out evaluation is
    the same frame — no second pass over facts."""
    o = cat(spark, sf_dir)["orders"]
    c = cat(spark, sf_dir)["customer"]
    n = cat(spark, sf_dir)["nation"]
    r = cat(spark, sf_dir)["region"]
    cy = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.year("o_orderdate").isin(HTS_Y0, HTS_Y1, HTS_Y2))
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    nat = cy.groupBy("region", "nation").agg(
        *[
            F.sum(F.when(F.col("yr") == y, F.col("rev"))).alias(f"r{i}")
            for i, y in enumerate((HTS_Y0, HTS_Y1, HTS_Y2))
        ]
    )
    f = (
        nat.filter(
            (F.col("r0") > 0) & (F.col("r1") > 0) & (F.col("r2") > 0)
        )
        .withColumn("fc_nat", F.col("r1") * F.col("r1") / F.col("r0"))
        .localCheckpoint()  # 25-nation frame; read by several branches
    )
    reg = f.groupBy("region").agg(
        F.count(F.lit(1)).cast("bigint").alias("nations"),
        F.sum("r0").alias("reg_r0"),
        F.sum("r1").alias("reg_r1"),
        F.sum("r2").alias("reg_r2"),
        F.sum("fc_nat").alias("fc_bu"),
    ).withColumn(
        "fc_direct", F.col("reg_r1") * F.col("reg_r1") / F.col("reg_r0")
    )
    ev = (
        f.join(
            F.broadcast(
                reg.select("region", "fc_direct", "reg_r1")
            ).withColumnRenamed("region", "rg"),
            F.col("region") == F.col("rg"),
        )
        .select(
            "region",
            F.abs(F.col("fc_nat") - F.col("r2")).alias("bu_err"),
            F.abs(
                F.col("fc_direct") * F.col("r1") / F.col("reg_r1")
                - F.col("r2")
            ).alias("td_err"),
        )
        .groupBy("region")
        .agg(
            (F.sum("bu_err") / F.count(F.lit(1))).alias("bu_nat_mae"),
            (F.sum("td_err") / F.count(F.lit(1))).alias("td_nat_mae"),
        )
    )
    money2 = lambda col: F.floor(col * 100 + 0.5) / 100  # noqa: E731
    return (
        reg.join(ev, "region")
        .select(
            "region",
            "nations",
            money2(F.col("reg_r2")).alias("actual"),
            money2(F.col("fc_direct")).alias("fc_direct"),
            money2(F.col("fc_bu")).alias("fc_bottom_up"),
            money2(F.col("fc_direct") - F.col("fc_bu")).alias(
                "coherence_gap"
            ),
            money2(F.col("bu_nat_mae")).alias("bu_nation_mae"),
            money2(F.col("td_nat_mae")).alias("td_nation_mae"),
        )
        .orderBy("region")
    )
