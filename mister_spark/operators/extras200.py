"""Wave 200: normality by order statistics and count-data regression.

stat_anderson_darling is the AD normality test on daily event volume —
the tail-weighted EDF test: KS (stat_ks_test) weighs the middle, CvM
(stat_cvm) integrates evenly, AD divides by F(1-F) so the TAILS decide,
which is exactly where normality assumptions die in practice (both
distribution parameters are estimated, so the Stephens small-sample
correction and the 0.752 critical value apply). ml_poisson_regression
is the canonical GLM for counts — the log-link trend fit whose
coefficient IS the daily growth rate; ml_logreg covers binary
responses, ml_ridge/quantile cover continuous ones, this closes the
family for the count-valued series every events pipeline produces.

Exactness: AD ranks come from the exact integer total order (y, t),
standardization uses integer moment sums, and Phi is the SAME
Abramowitz-Stegun polynomial string on both engines
(functions/special.py); the Poisson IRLS replays iteration-for-
iteration as a recursive CTE with identical per-row algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
AD_CRIT_5PCT = 0.752  # Stephens, both params estimated
AD_EPS = 1e-12  # shared CDF clamp so extreme tails never hit ln(0)
POIS_ITERS = 8

_SF = normal_sf_sql("ABS(z)")
# Phi(z) and 1-Phi(z) from the one-sided survival polynomial
_P_LO = f"GREATEST(CASE WHEN z >= 0 THEN 1.0 - {_SF} ELSE {_SF} END, {AD_EPS})"
_P_HI = f"GREATEST(CASE WHEN z >= 0 THEN {_SF} ELSE 1.0 - {_SF} END, {AD_EPS})"


@query(
    "stat_anderson_darling",
    # Real oracle: the order statistics come from ROW_NUMBER over the
    # exact integer total order (y, t); mean/sd divide integer moment
    # sums; Phi is the SAME A&S 7.1.26 polynomial evaluated on both
    # engines (any approximation error is shared), so the only drift
    # is LN/sum ulps, absorbed by the grid; the rejection flag
    # compares the ROUNDED statistic in both engines.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(y * y) AS syy
          FROM d),
    sd AS (SELECT n, CAST(sy AS DOUBLE) / n AS mean,
                  SQRT(CAST(n * syy - sy * sy AS DOUBLE)
                       / (n * (n - 1))) AS sdev
           FROM m WHERE n > 1),
    r AS (SELECT ROW_NUMBER() OVER (ORDER BY d.y, d.t) AS i,
                 (d.y - sd.mean) / sd.sdev AS z, sd.n
          FROM d, sd),
    terms AS (SELECT SUM((2 * i - 1) * LN({_P_LO})
                         + (2 * (n - i) + 1) * LN({_P_HI})) AS s,
                     MAX(n) AS n
              FROM r),
    a AS (SELECT n, -CAST(n AS DOUBLE) - s / n AS a2 FROM terms),
    fin AS (SELECT n, a2,
                   a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n))
                     AS a2s
            FROM a)
    SELECT (SELECT CAST(n AS BIGINT) FROM fin) AS n_days,
           (SELECT FLOOR(mean * 1e4 + 0.5) / 1e4 FROM sd) AS mean,
           (SELECT FLOOR(sdev * 1e4 + 0.5) / 1e4 FROM sd) AS sd,
           FLOOR(a2 * 1e6 + 0.5) / 1e6 AS a2,
           FLOOR(a2s * 1e6 + 0.5) / 1e6 AS a2_star,
           CASE WHEN FLOOR(a2s * 1e6 + 0.5) / 1e6 > {AD_CRIT_5PCT}
                THEN 1 ELSE 0 END AS normality_rejected
    FROM fin
    """,
)
def stat_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling normality test of daily event volume (params
    estimated): standardize by the sample mean/sd, walk the order
    statistics, and weight each empirical-vs-normal CDF gap by
    1/(F(1-F)) — the tails get the microphone. A² is then Stephens-
    corrected for n and compared to 0.752 (5%). Rejecting here is the
    evidence that z-score-based monitors (ev_zscore, control charts)
    need a heavier-tailed reference than the Gaussian they assume;
    stat_jarque_bera asks via moments, this asks via the whole CDF and
    dominates it at small n.

    Scale: ONE day-grain count collapses events to the calendar-
    bounded frame; ranks come from the two-phase range-partitioned
    global_rank (no single-task sort); Phi is a codegen polynomial —
    no UDF, no collect. Map-side combinable up to the model-sized
    rank stage."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # feeds moments + the ranked pass
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    sd = m.filter(F.col("n") > 1).select(
        "n",
        (F.col("sy").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * (F.col("n") - 1))
        ).alias("sdev"),
    )
    ranked = global_rank(d, "y", "t", rank_col="i").crossJoin(F.broadcast(sd))
    z = (F.col("y") - F.col("mean")) / F.col("sdev")
    sf = normal_sf(F.abs(z))
    p_lo = F.greatest(
        F.when(z >= 0, 1.0 - sf).otherwise(sf), F.lit(AD_EPS)
    )
    p_hi = F.greatest(
        F.when(z >= 0, sf).otherwise(1.0 - sf), F.lit(AD_EPS)
    )
    terms = ranked.agg(
        F.sum(
            (2 * F.col("i") - 1) * F.log(p_lo)
            + (2 * (F.col("n") - F.col("i")) + 1) * F.log(p_hi)
        ).alias("s"),
        F.max("n").alias("n"),
    )
    nD = F.col("n").cast("double")
    a2 = -nD - F.col("s") / F.col("n")
    a2s = a2 * (1.0 + 0.75 / nD + 2.25 / (nD * nD))
    return (
        terms.crossJoin(F.broadcast(sd.select("mean", "sdev")))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            rnd(F.col("mean"), 4).alias("mean"),
            rnd(F.col("sdev"), 4).alias("sd"),
            rnd(a2, 6).alias("a2"),
            rnd(a2s, 6).alias("a2_star"),
            F.when(rnd(a2s, 6) > AD_CRIT_5PCT, 1)
            .otherwise(0)
            .alias("normality_rejected"),
        )
    )


# IRLS weighted-sum aggregation over the centered day frame — shared
# per-row algebra (eta -> mu -> working response z) in both engines.
_POIS_SOLVE = (
    "(szw * sxxw - sxw * sxzw) / (sw * sxxw - sxw * sxw)",
    "(sw * sxzw - sxw * szw) / (sw * sxxw - sxw * sxw)",
)


@query(
    "ml_poisson_regression",
    # Real oracle: the IRLS loop replays as a recursive CTE carrying
    # (b0, b1) — every level recomputes the same five weighted sums
    # over the same centered day frame with identical per-row algebra
    # (eta, mu=EXP(eta), z=eta+(y-mu)/mu) and the same closed-form 2x2
    # solve; deviances score the final coefficients. Only EXP/LN/sum
    # ulps drift, absorbed by the grid.
    oracle=f"""
    WITH RECURSIVE
    d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE)) AS t,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(t) AS st
          FROM d),
    dx AS (SELECT CAST(d.y AS DOUBLE) AS y,
                  CAST(d.t AS DOUBLE) - CAST(m.st AS DOUBLE) / m.n AS x
           FROM d, m),
    irls AS (
      SELECT 0 AS it, LN(CAST(m.sy AS DOUBLE) / m.n) AS b0,
             CAST(0.0 AS DOUBLE) AS b1
      FROM m
      UNION ALL
      SELECT q.it + 1,
             {_POIS_SOLVE[0]},
             {_POIS_SOLVE[1]}
      FROM (SELECT r2.it,
                   SUM(r2.mu) AS sw, SUM(r2.mu * r2.x) AS sxw,
                   SUM(r2.mu * r2.x * r2.x) AS sxxw,
                   SUM(r2.mu * r2.z) AS szw,
                   SUM(r2.mu * r2.x * r2.z) AS sxzw
            FROM (SELECT r1.it, r1.x, r1.mu,
                         r1.eta + (r1.y - r1.mu) / r1.mu AS z
                  FROM (SELECT i.it, dx.x, dx.y,
                               i.b0 + i.b1 * dx.x AS eta,
                               EXP(i.b0 + i.b1 * dx.x) AS mu
                        FROM irls i, dx
                        WHERE i.it < {POIS_ITERS}) r1) r2
            GROUP BY r2.it) q
    ),
    bfin AS (SELECT b0, b1 FROM irls WHERE it = {POIS_ITERS}),
    dev AS (SELECT SUM(2.0 * (CASE WHEN dx.y > 0
                              THEN dx.y * LN(dx.y
                                             / EXP(b.b0 + b.b1 * dx.x))
                              ELSE 0.0 END
                              - (dx.y - EXP(b.b0 + b.b1 * dx.x)))) AS dv
            FROM dx, bfin b),
    dev0 AS (SELECT SUM(2.0 * (CASE WHEN dx.y > 0
                               THEN dx.y * LN(dx.y
                                              / (CAST(m.sy AS DOUBLE) / m.n))
                               ELSE 0.0 END
                               - (dx.y - CAST(m.sy AS DOUBLE) / m.n))) AS dv0
             FROM dx, m)
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_days,
           FLOOR(b.b0 * 1e6 + 0.5) / 1e6 AS beta0,
           FLOOR(b.b1 * 1e6 + 0.5) / 1e6 AS beta1,
           FLOOR(EXP(b.b1) * 1e6 + 0.5) / 1e6 AS rate_ratio_per_day,
           FLOOR(dev.dv * 1e4 + 0.5) / 1e4 AS deviance,
           FLOOR(dev0.dv0 * 1e4 + 0.5) / 1e4 AS null_deviance,
           FLOOR((1.0 - dev.dv / dev0.dv0) * 1e6 + 0.5) / 1e6 AS pseudo_r2
    FROM bfin b, dev, dev0
    """,
)
def ml_poisson_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM (log link) of daily purchase counts on the centered
    day index, fit by {it} IRLS rounds: eta = b0 + b1*x, working
    response z = eta + (y-mu)/mu, weights mu, closed-form 2x2 weighted
    solve per round. exp(b1) is the fitted DAILY RATE RATIO — the
    compounding growth a linear fit on raw counts (stat_regression)
    cannot express, with variance tied to the mean as count data
    demands. Deviance vs the intercept-only model gives the pseudo-R².

    Scale: the fit state is TWO scalars; every IRLS round is ONE
    map-side-combinable aggregation of five weighted sums over the
    calendar-bounded day frame — the classic distributed-GLM shape
    (statistics to the driver, never rows). {it} rounds = {it} tiny
    jobs; deviance is one more pass with the final coefficients."""
    import math

    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "t"
            ),
            "event_type",
        )
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("t").alias("st"),
    )
    nv, syv, stv = m.collect()[0]
    dx = d.select(
        F.col("y").cast("double").alias("y"),
        (F.col("t").cast("double") - float(stv) / nv).alias("x"),
    ).localCheckpoint()  # feeds every IRLS round + both deviance passes
    b0, b1 = math.log(float(syv) / nv), 0.0
    for _ in range(POIS_ITERS):
        eta = F.lit(b0) + F.lit(b1) * F.col("x")
        mu = F.exp(eta)
        z = eta + (F.col("y") - mu) / mu
        s = dx.agg(
            F.sum(mu).alias("sw"),
            F.sum(mu * F.col("x")).alias("sxw"),
            F.sum(mu * F.col("x") * F.col("x")).alias("sxxw"),
            F.sum(mu * z).alias("szw"),
            F.sum(mu * F.col("x") * z).alias("sxzw"),
        ).collect()[0]
        det = s["sw"] * s["sxxw"] - s["sxw"] * s["sxw"]
        b0 = (s["szw"] * s["sxxw"] - s["sxw"] * s["sxzw"]) / det
        b1 = (s["sw"] * s["sxzw"] - s["sxw"] * s["szw"]) / det
    mu_fin = F.exp(F.lit(b0) + F.lit(b1) * F.col("x"))
    mu_null = F.lit(float(syv) / nv)

    def _dev(mu_col):
        return F.sum(
            2.0
            * (
                F.when(
                    F.col("y") > 0, F.col("y") * F.log(F.col("y") / mu_col)
                ).otherwise(0.0)
                - (F.col("y") - mu_col)
            )
        )

    dev = dx.agg(_dev(mu_fin).alias("dv"), _dev(mu_null).alias("dv0"))
    return dev.select(
        F.lit(int(nv)).cast("bigint").alias("n_days"),
        rnd(F.lit(b0), 6).alias("beta0"),
        rnd(F.lit(b1), 6).alias("beta1"),
        rnd(F.exp(F.lit(b1)), 6).alias("rate_ratio_per_day"),
        rnd(F.col("dv"), 4).alias("deviance"),
        rnd(F.col("dv0"), 4).alias("null_deviance"),
        rnd(1.0 - F.col("dv") / F.col("dv0"), 6).alias("pseudo_r2"),
    )


ml_poisson_regression.__doc__ = ml_poisson_regression.__doc__.format(
    it=POIS_ITERS
)
