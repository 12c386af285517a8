"""Wave 202: privacy-budget accounting and risk-adjusted return ratios.

ds_dp_accountant answers the question every DP release pipeline
(ds_dp_noisy_counts publishes per-day/per-type Gaussian counts) must
answer before its NEXT release: how much (epsilon, delta) has the
cadence already burned? It prices the actual release schedule found
in the data (one Gaussian release per (day, event_type) cell) under
the three standard accountants — naive/basic composition, Dwork
advanced composition, and zCDP — whose gap IS the reason modern
pipelines track rho, not epsilon. fin_sharpe_ratios is the
risk-adjusted performance ladder on daily order revenue: Sharpe
(symmetric vol), Sortino (downside-only vol) — the numbers that make
two revenue streams with equal growth comparable; fin_expected_
shortfall prices the tail, ev_drawdown the path, this the ratio.

Exactness: the accountant's only data input is the integer release
count (everything else is shared literal algebra); Sharpe/Sortino run
on integer-CENT daily sums, so the up/down day classification is an
integer comparison and only the final ratio divisions are float.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
DP_SIGMA = 16.0  # Gaussian mechanism noise (sensitivity-1 counts):
# large enough that the per-release eps0 stays < 1 over the release
# horizon — the regime advanced composition is designed for (with
# eps0 > 1 its second-order k*eps0*(e^eps0 - 1) term makes it WORSE
# than basic, and the comparison the op exists to show degenerates)
DP_DELTA = 1e-6  # total delta budget
DP_RHO = 1.0 / (2.0 * DP_SIGMA * DP_SIGMA)  # zCDP cost per release
TRADING_DAYS = 252  # annualization factor


@query(
    "ds_dp_accountant",
    # Real oracle: the only data-dependent input is the BIGINT count
    # of (day, event_type) release cells; every epsilon is the same
    # closed-form expression of that integer and shared literals —
    # LN/SQRT/EXP of identical operands, inside the grid.
    oracle=f"""
    WITH rel AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                     AS d, event_type
                 FROM events GROUP BY 1, 2),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM rel),
    e0 AS (SELECT k,
                  {DP_RHO} + 2.0 * SQRT({DP_RHO}
                      * LN(2.0 * k / {DP_DELTA})) AS eps0
           FROM k),
    fin AS (SELECT k, eps0,
                   k * eps0 AS eps_basic,
                   SQRT(2.0 * k * LN(2.0 / {DP_DELTA})) * eps0
                     + k * eps0 * (EXP(eps0) - 1.0) AS eps_adv,
                   k * {DP_RHO}
                     + 2.0 * SQRT(k * {DP_RHO} * LN(1.0 / {DP_DELTA}))
                     AS eps_zcdp
            FROM e0)
    SELECT k AS n_releases,
           {DP_SIGMA} AS sigma,
           FLOOR(k * {DP_RHO} * 1e6 + 0.5) / 1e6 AS rho_total,
           FLOOR(eps0 * 1e6 + 0.5) / 1e6 AS eps_per_release,
           FLOOR(eps_basic * 1e4 + 0.5) / 1e4 AS eps_basic,
           FLOOR(eps_adv * 1e4 + 0.5) / 1e4 AS eps_advanced,
           FLOOR(eps_zcdp * 1e4 + 0.5) / 1e4 AS eps_zcdp,
           FLOOR(eps_basic / eps_zcdp * 1e4 + 0.5) / 1e4
             AS basic_over_zcdp
    FROM fin
    """,
)
def ds_dp_accountant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-budget statement for the engine's daily noisy-count
    cadence: k = the number of (day, event_type) Gaussian releases
    found in the data, each costing rho = 1/(2 sigma^2) in zCDP.
    Reports the total budget under basic composition (k*eps0, the
    naive bound), advanced composition (sqrt(2k ln(1/d'))*eps0 + the
    second-order term), and the zCDP conversion eps = k*rho +
    2*sqrt(k*rho*ln(1/delta)) — with per-release delta split
    delta/(2k). basic_over_zcdp is the factor the right accountant
    saves; it grows like sqrt(k), which is why a pipeline that prices
    releases naively stops releasing months before one that tracks
    rho. The per-release eps0 also tells a reviewer what any SINGLE
    day's release leaks.

    Scale: one distinct-collapse groupBy (map-side combinable) to the
    release-cell count; the accountancy is closed-form arithmetic on
    one scalar. At 100 TB the release schedule is still calendar x
    type sized — this op is O(1) beyond the collapse."""
    rel = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "d"
            ),
            "event_type",
        )
        .distinct()
    )
    k = rel.agg(F.count(F.lit(1)).alias("k"))
    kD = F.col("k").cast("double")
    eps0 = DP_RHO + 2.0 * F.sqrt(
        F.lit(DP_RHO) * F.log(2.0 * kD / DP_DELTA)
    )
    out = k.select(
        "k",
        eps0.alias("eps0"),
    )
    e0 = F.col("eps0")
    kD2 = F.col("k").cast("double")
    return out.select(
        F.col("k").alias("n_releases"),
        F.lit(DP_SIGMA).alias("sigma"),
        rnd(kD2 * DP_RHO, 6).alias("rho_total"),
        rnd(e0, 6).alias("eps_per_release"),
        rnd(kD2 * e0, 4).alias("eps_basic"),
        rnd(
            F.sqrt(2.0 * kD2 * math.log(2.0 / DP_DELTA)) * e0
            + kD2 * e0 * (F.exp(e0) - 1.0),
            4,
        ).alias("eps_advanced"),
        rnd(
            kD2 * DP_RHO
            + 2.0 * F.sqrt(kD2 * DP_RHO * math.log(1.0 / DP_DELTA)),
            4,
        ).alias("eps_zcdp"),
        rnd(
            (kD2 * e0)
            / (
                kD2 * DP_RHO
                + 2.0 * F.sqrt(kD2 * DP_RHO * math.log(1.0 / DP_DELTA))
            ),
            4,
        ).alias("basic_over_zcdp"),
    )


@query(
    "fin_sharpe_ratios",
    # Real oracle: daily revenue is summed in exact integer CENTS
    # (floor(x*100+0.5) per row), so returns divide identical
    # integers and the up/down classification is an integer compare;
    # mean/sd/downside sums drift only at float-sum order, inside
    # the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}',
                                CAST(o_orderdate AS DATE)) AS t,
                      CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS cents
               FROM orders GROUP BY 1),
    r AS (SELECT c.t,
                 CAST(c.cents AS DOUBLE) / p.cents - 1.0 AS ret,
                 CASE WHEN c.cents < p.cents THEN 1 ELSE 0 END AS dn
          FROM d c JOIN d p ON p.t = c.t - 1
          WHERE p.cents > 0),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(ret) AS sr,
                 SUM(ret * ret) AS srr,
                 SUM(CASE WHEN dn = 1 THEN ret * ret ELSE 0.0 END) AS sdd,
                 CAST(SUM(dn) AS BIGINT) AS ndown
          FROM r),
    fin AS (SELECT n, ndown, sr / n AS mu,
                   SQRT((srr - sr * sr / n) / (n - 1)) AS vol,
                   SQRT(sdd / n) AS ddev
            FROM m WHERE n > 1)
    SELECT CAST(n AS BIGINT) AS n_days,
           ndown AS down_days,
           FLOOR(mu * 1e6 + 0.5) / 1e6 AS mean_daily_ret,
           FLOOR(vol * 1e6 + 0.5) / 1e6 AS vol_daily,
           FLOOR(CASE WHEN vol > 0
                 THEN mu / vol * SQRT({TRADING_DAYS}.0) ELSE 0.0 END
                 * 1e4 + 0.5) / 1e4 AS sharpe_annual,
           FLOOR(CASE WHEN ddev > 0
                 THEN mu / ddev * SQRT({TRADING_DAYS}.0) ELSE 0.0 END
                 * 1e4 + 0.5) / 1e4 AS sortino_annual
    FROM fin
    """,
)
def fin_sharpe_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily order-revenue stream:
    day-over-day returns on integer-cent revenue sums, annualized by
    sqrt(252). Sharpe divides mean return by FULL volatility; Sortino
    divides by downside-only deviation (sqrt(mean of squared negative
    returns)) — the fix for penalizing upside surprises, which is why
    a growth series with occasional crashes separates on Sortino long
    before Sharpe moves. down_days is the integer-exact count of
    revenue-shrinking days.

    Scale: ONE day-grain cent-sum (map-side combinable, integer-
    exact), one lag equi-join on the calendar-bounded frame, one
    moment aggregation. Closed form from there."""
    d = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit(EPOCH).cast("date")
            ).alias("t"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("t")
        .agg(F.sum("c").alias("cents"))
        .localCheckpoint()  # feeds both lag aliases
    )
    p = d.select((F.col("t") + 1).alias("t"), F.col("cents").alias("pc"))
    r = (
        d.join(p, "t")
        .filter(F.col("pc") > 0)
        .select(
            (F.col("cents").cast("double") / F.col("pc") - 1.0).alias(
                "ret"
            ),
            F.when(F.col("cents") < F.col("pc"), 1).otherwise(0).alias("dn"),
        )
    )
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ret").alias("sr"),
        F.sum(F.col("ret") * F.col("ret")).alias("srr"),
        F.sum(
            F.when(F.col("dn") == 1, F.col("ret") * F.col("ret")).otherwise(
                0.0
            )
        ).alias("sdd"),
        F.sum("dn").alias("ndown"),
    ).filter(F.col("n") > 1)
    mu = F.col("sr") / F.col("n")
    vol = F.sqrt(
        (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n"))
        / (F.col("n") - 1)
    )
    ddev = F.sqrt(F.col("sdd") / F.col("n"))
    ann = math.sqrt(float(TRADING_DAYS))
    return m.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("ndown").cast("bigint").alias("down_days"),
        rnd(mu, 6).alias("mean_daily_ret"),
        rnd(vol, 6).alias("vol_daily"),
        rnd(
            F.when(vol > 0, mu / vol * ann).otherwise(0.0), 4
        ).alias("sharpe_annual"),
        rnd(
            F.when(ddev > 0, mu / ddev * ann).otherwise(0.0), 4
        ).alias("sortino_annual"),
    )
