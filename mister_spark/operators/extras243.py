"""Wave 243: portfolio analytics over business units.

fin_two_asset_frontier treats the two largest nations' daily revenue
streams as a two-asset portfolio: from one panel pass it derives the
closed-form minimum-variance weight
w* = (s2^2 - s12)/(s1^2 + s2^2 - 2 s12) and walks the frontier over
a weight grid — the concrete "how much of the volatility is
diversifiable between our two biggest markets" picture.
fin_diversification_ratio generalizes to ALL nations at equal
weight: DR = (sum w_i sigma_i) / sigma_portfolio, computed from the
full nation-by-nation covariance of the gap-filled panel. DR = 1
means the units move as one (no diversification to harvest); DR near
sqrt(n) means independent engines. fin_revenue_beta prices each
unit against the book; these two price the BOOK's construction.

Exactness: the panel sums in integer cents, variances/covariances
are shared closed forms on identical operands, and every frontier
or ratio row rounds on the grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
FRONTIER_STEPS = 5  # weights 0, .25, .5, .75, 1

_PANEL_SQL = f"""
    cell AS (SELECT c.c_nationkey AS z,
                    date_diff('day', DATE '{EPOCH}',
                              CAST(o.o_orderdate AS DATE)) AS t,
                    CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY 1, 2),
    days AS (SELECT t FROM cell GROUP BY t),
    zs AS (SELECT DISTINCT z FROM cell),
    fp AS (SELECT zs.z, days.t,
                  CAST(COALESCE(cell.cents, 0) AS DOUBLE) / 100 AS y
           FROM zs CROSS JOIN days
           LEFT JOIN cell ON cell.z = zs.z AND cell.t = days.t)
"""


@query(
    "fin_two_asset_frontier",
    # Real oracle: the two largest nations are an integer-cent
    # argsort, their variances/covariance are shared closed forms on
    # the gap-filled panel, and every frontier row is the same
    # quadratic, on the grid.
    oracle=f"""
    WITH {_PANEL_SQL},
    tot AS (SELECT z, CAST(SUM(cents) AS BIGINT) AS c FROM cell
            GROUP BY 1),
    top2 AS (SELECT z, ROW_NUMBER() OVER (ORDER BY c DESC, z) AS rk
             FROM tot QUALIFY rk <= 2),
    ab AS (SELECT a.t, a.y AS ya, b.y AS yb
           FROM fp a JOIN fp b ON b.t = a.t
           WHERE a.z = (SELECT z FROM top2 WHERE rk = 1)
             AND b.z = (SELECT z FROM top2 WHERE rk = 2)),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(ya) AS ma, AVG(yb) AS mb,
                 (SUM(ya * ya) - COUNT(*) * AVG(ya) * AVG(ya))
                   / (COUNT(*) - 1) AS va,
                 (SUM(yb * yb) - COUNT(*) * AVG(yb) * AVG(yb))
                   / (COUNT(*) - 1) AS vb,
                 (SUM(ya * yb) - COUNT(*) * AVG(ya) * AVG(yb))
                   / (COUNT(*) - 1) AS cab
          FROM ab),
    wgrid AS (SELECT CAST(i AS DOUBLE) / {FRONTIER_STEPS - 1} AS w
              FROM (SELECT unnest(generate_series(0,
                    {FRONTIER_STEPS - 1})) AS i)),
    fr AS (SELECT w, s.ma, s.mb, s.va, s.vb, s.cab,
                  w * w * s.va + (1 - w) * (1 - w) * s.vb
                  + 2 * w * (1 - w) * s.cab AS pv
           FROM wgrid, s),
    mv AS (SELECT (vb - cab) / (va + vb - 2 * cab) AS wstar FROM s)
    SELECT FLOOR(fr.w * 100 + 0.5) / 100 AS weight_a,
           FLOOR((fr.w * fr.ma + (1 - fr.w) * fr.mb) * 100 + 0.5) / 100
             AS expected_daily,
           FLOOR(SQRT(GREATEST(fr.pv, 0.0)) * 100 + 0.5) / 100
             AS daily_vol,
           FLOOR(GREATEST(LEAST(mv.wstar, 1.0), 0.0) * 1e4 + 0.5) / 1e4
             AS min_var_weight_a
    FROM fr, mv
    """,
)
def fin_two_asset_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-asset frontier between the two largest markets' daily
    revenue: portfolio variance w^2 v_a + (1-w)^2 v_b + 2w(1-w)c_ab
    walked over a weight grid, plus the closed-form minimum-variance
    weight w* = (v_b - c_ab)/(v_a + v_b - 2 c_ab) (clamped to [0,1]).
    If the frontier's waist sits well below either endpoint, the two
    markets genuinely hedge each other; if w* pins to an endpoint,
    "diversification" between them is an illusion of correlation.

    Scale: one fact aggregation to the dimension x calendar panel;
    the frontier is closed-form rows on two (mean, var, cov)
    triples."""
    cell = (
        cat(spark, sf_dir)["orders"]
        .join(
            F.broadcast(
                cat(spark, sf_dir)["customer"].select(
                    "c_custkey", F.col("c_nationkey").alias("z")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "z",
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit(EPOCH)
            ).alias("t"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("z", "t")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()
    )
    tot = cell.groupBy("z").agg(F.sum("cents").alias("c"))
    top2 = [
        r["z"]
        for r in tot.orderBy(F.col("c").desc(), "z").limit(2).collect()
    ]
    days = cell.select("t").distinct()
    fp = {}
    for label, zz in zip(("a", "b"), top2):
        fp[label] = days.join(
            cell.filter(F.col("z") == zz).select("t", "cents"), "t", "left"
        ).select(
            "t",
            (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100).alias(
                f"y{label}"
            ),
        )
    ab = fp["a"].join(fp["b"], "t")
    s = ab.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("ya").alias("ma"), F.avg("yb").alias("mb"),
        (
            (F.sum(F.col("ya") * F.col("ya"))
             - F.count(F.lit(1)) * F.avg("ya") * F.avg("ya"))
            / (F.count(F.lit(1)) - 1)
        ).alias("va"),
        (
            (F.sum(F.col("yb") * F.col("yb"))
             - F.count(F.lit(1)) * F.avg("yb") * F.avg("yb"))
            / (F.count(F.lit(1)) - 1)
        ).alias("vb"),
        (
            (F.sum(F.col("ya") * F.col("yb"))
             - F.count(F.lit(1)) * F.avg("ya") * F.avg("yb"))
            / (F.count(F.lit(1)) - 1)
        ).alias("cab"),
    )
    row = s.collect()[0]
    ma, mb = row["ma"], row["mb"]
    va, vb, cab = row["va"], row["vb"], row["cab"]
    wstar = max(min((vb - cab) / (va + vb - 2 * cab), 1.0), 0.0)
    g2 = lambda x: math.floor(x * 100 + 0.5) / 100  # noqa: E731
    out = []
    for i in range(FRONTIER_STEPS):
        w = i / (FRONTIER_STEPS - 1)
        pv = w * w * va + (1 - w) * (1 - w) * vb + 2 * w * (1 - w) * cab
        out.append(
            (
                g2(w), g2(w * ma + (1 - w) * mb),
                g2(math.sqrt(max(pv, 0.0))),
                math.floor(wstar * 1e4 + 0.5) / 1e4,
            )
        )
    return spark.createDataFrame(
        out,
        "weight_a double, expected_daily double, daily_vol double, "
        "min_var_weight_a double",
    )


@query(
    "fin_diversification_ratio",
    # Real oracle: per-nation variances and the portfolio variance
    # come from the same gap-filled panel (portfolio series = exact
    # cent totals), so DR is a ratio of shared closed forms on the
    # grid.
    oracle=f"""
    WITH {_PANEL_SQL},
    pv AS (SELECT z, (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y))
                     / (COUNT(*) - 1) AS v
           FROM fp GROUP BY 1),
    nz AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM zs),
    num AS (SELECT SUM(SQRT(GREATEST(v, 0.0))) AS s FROM pv),
    port AS (SELECT t, SUM(y) AS y FROM fp GROUP BY 1),
    pvar AS (SELECT (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y))
                    / (COUNT(*) - 1) AS v
             FROM port)
    SELECT CAST(nz.k AS BIGINT) AS n_units,
           FLOOR(num.s / nz.k * 100 + 0.5) / 100 AS avg_unit_vol,
           FLOOR(SQRT(GREATEST(pvar.v, 0.0)) / nz.k * 100 + 0.5) / 100
             AS portfolio_vol_per_unit,
           -- zero portfolio variance with live units = perfect
           -- hedging: sentinel 9999
           FLOOR(CASE WHEN pvar.v <= 0 THEN 9999.0
                      ELSE (num.s / nz.k)
                           / (SQRT(pvar.v) / nz.k) END * 1e4 + 0.5)
             / 1e4 AS diversification_ratio,
           FLOOR(SQRT(nz.k) * 1e4 + 0.5) / 1e4 AS independence_bound
    FROM nz, num, pvar
    """,
)
def fin_diversification_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-weight diversification ratio across all nations' daily
    revenue: DR = (mean unit volatility) / (portfolio volatility per
    unit). DR = 1 means the units are one trade in disguise (zero
    diversification); DR approaching sqrt(n) means independent
    engines; the gap between the measured DR and the independence
    bound is exactly how much co-movement eats. The one-number
    answer to "is our geographic spread actually spreading risk?"

    Scale: one fact aggregation to the gap-filled panel; unit
    variances are a grouped pass and the portfolio series is the
    exact per-day total — no n x n covariance materializes."""
    cell = (
        cat(spark, sf_dir)["orders"]
        .join(
            F.broadcast(
                cat(spark, sf_dir)["customer"].select(
                    "c_custkey", F.col("c_nationkey").alias("z")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "z",
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit(EPOCH)
            ).alias("t"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("z", "t")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()
    )
    days = cell.select("t").distinct()
    zs = cell.select("z").distinct()
    fp = (
        zs.crossJoin(F.broadcast(days))
        .join(cell, ["z", "t"], "left")
        .select(
            "z", "t",
            (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100).alias(
                "y"
            ),
        )
        .localCheckpoint()
    )
    pv = fp.groupBy("z").agg(
        (
            (F.sum(F.col("y") * F.col("y"))
             - F.count(F.lit(1)) * F.avg("y") * F.avg("y"))
            / (F.count(F.lit(1)) - 1)
        ).alias("v")
    )
    nz = zs.agg(F.count(F.lit(1)).cast("double").alias("k"))
    num = pv.agg(F.sum(F.sqrt(F.greatest(F.col("v"), F.lit(0.0)))).alias("s"))
    port = fp.groupBy("t").agg(F.sum("y").alias("y"))
    pvar = port.agg(
        (
            (F.sum(F.col("y") * F.col("y"))
             - F.count(F.lit(1)) * F.avg("y") * F.avg("y"))
            / (F.count(F.lit(1)) - 1)
        ).alias("v")
    )
    return (
        nz.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(pvar))
        .select(
            F.col("k").cast("bigint").alias("n_units"),
            rnd(F.col("s") / F.col("k"), 2).alias("avg_unit_vol"),
            rnd(
                F.sqrt(F.greatest(F.col("v"), F.lit(0.0))) / F.col("k"), 2
            ).alias("portfolio_vol_per_unit"),
            rnd(
                F.when(F.col("v") <= 0, F.lit(9999.0)).otherwise(
                    (F.col("s") / F.col("k"))
                    / (F.sqrt(F.col("v")) / F.col("k"))
                ),
                4,
            ).alias("diversification_ratio"),
            rnd(F.sqrt(F.col("k")), 4).alias("independence_bound"),
        )
    )
