"""Wave 191: unit roots and common trends.

stat_adf is the (augmented, one lag) Dickey-Fuller unit-root test on
daily event volume: is the series mean-reverting, or a random walk
whose "trend" is an illusion? Every forecast, control chart, and
z-score monitor in this engine implicitly assumes the answer; ADF is
the test that checks it (stat_arch_lm asks about the VARIANCE,
stat_hurst about long memory — this is the LEVEL question).
stat_cointegration is the Engle-Granger two-step between the click
and view daily series: two individually drifting series can still be
tied by a stationary spread, and that spread — not either series —
is what a ratio alert or a pairs monitor should watch.

Both run entirely on the calendar-bounded day frame: integer day
counts make every moment sum exact, so the closed-form OLS algebra
divides cross-engine-identical operands. The regression expressions
are SHARED STRINGS evaluated by Spark's selectExpr and interpolated
into the DuckDB oracle — the algebra cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.operators.extras109 import _det3
from mister_spark.registry import query

EPOCH = "1970-01-01"

# 3x3 normal equations for  dy_t = alpha + rho*y_{t-1} + phi*dy_{t-1}:
# X'X = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], X'z = (sz, s1z, s2z).
_C1 = ("n", "s1", "s2")
_C2 = ("s1", "s11", "s12")
_C3 = ("s2", "s12", "s22")
_RHS = ("sz", "s1z", "s2z")
ADF_DET = _det3(_C1, _C2, _C3)
# Cramer solves (same strings run in Spark selectExpr and DuckDB)
ADF_B_EXPRS = [
    f"{_det3(_RHS, _C2, _C3)} / NULLIF({ADF_DET}, 0) AS alpha",
    f"{_det3(_C1, _RHS, _C3)} / NULLIF({ADF_DET}, 0) AS rho_raw",
    f"{_det3(_C1, _C2, _RHS)} / NULLIF({ADF_DET}, 0) AS phi",
]
# var(rho) = s^2 * [(X'X)^-1]_{rho,rho}; the cofactor of the rho cell
# is the minor det [[n,s2],[s2,s22]] (delete rho's row+col, sign +).
ADF_VAR_RHO = (
    f"(szz - (alpha*sz + rho_raw*s1z + phi*s2z)) / NULLIF(n - 3, 0)"
    f" * (n*s22 - s2*s2) / NULLIF({ADF_DET}, 0)"
)
ADF_T_EXPR = (
    f"CASE WHEN n > 3 AND COALESCE({ADF_VAR_RHO}, 0) > 0"
    f" THEN rho_raw / SQRT({ADF_VAR_RHO}) ELSE 0.0 END AS tstat"
)
ADF_CRIT_5PCT = -2.86  # DF tau-mu critical value, constant, 5%


@query(
    "stat_adf",
    # Real oracle: day counts are integers so every moment sum is
    # exact; the Cramer/cofactor algebra below is the SAME string the
    # Spark plan evaluates, dividing bit-identical operands. The 1e-4
    # grid on t absorbs nothing but the final division's last ulp,
    # and the rejection flag compares the ROUNDED t in both engines.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    r AS (SELECT c.y - p1.y AS z, p1.y AS x1, p1.y - p2.y AS x2
          FROM d c JOIN d p1 ON p1.t = c.t - 1
                   JOIN d p2 ON p2.t = c.t - 2),
    mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   SUM(x1) AS s1, SUM(x2) AS s2, SUM(x1*x1) AS s11,
                   SUM(x1*x2) AS s12, SUM(x2*x2) AS s22, SUM(z) AS sz,
                   SUM(x1*z) AS s1z, SUM(x2*z) AS s2z, SUM(z*z) AS szz
            FROM r),
    b AS (SELECT mom.*, {", ".join(ADF_B_EXPRS)} FROM mom),
    g AS (SELECT b.*, {ADF_T_EXPR} FROM b)
    SELECT CAST(n AS BIGINT) AS n_obs,
           FLOOR(COALESCE(rho_raw, 0.0) * 1e6 + 0.5) / 1e6 AS rho,
           FLOOR(tstat * 1e4 + 0.5) / 1e4 AS adf_t,
           CASE WHEN FLOOR(tstat * 1e4 + 0.5) / 1e4 < {ADF_CRIT_5PCT}
                THEN 1 ELSE 0 END AS unit_root_rejected
    FROM g
    """,
)
def stat_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADF(1) with constant on daily event counts: regress the day-
    over-day change on the lagged level and the lagged change; the
    t-statistic of the level coefficient against the tau critical
    value -2.86 decides random walk (keep differencing) vs mean
    reversion (levels are safe to model). A z-score alert on a
    unit-root series pages forever on one side — this is the test
    that says whether ev_zscore-family monitors are even applicable.

    Scale: ONE day-grain count collapses events to the calendar-
    bounded frame; two integer lag self-joins on that model-sized
    frame, one moment aggregation, closed-form Cramer solve on a
    single row. No windows, no iteration, nothing driver-sized."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # feeds three join aliases of the lag frame
    )
    cur = d.select(F.col("t"), F.col("y").alias("y0"))
    p1 = d.select((F.col("t") + 1).alias("t"), F.col("y").alias("y1"))
    p2 = d.select((F.col("t") + 2).alias("t"), F.col("y").alias("y2"))
    r = (
        cur.join(p1, "t")
        .join(p2, "t")
        .select(
            (F.col("y0") - F.col("y1")).alias("z"),
            F.col("y1").alias("x1"),
            (F.col("y1") - F.col("y2")).alias("x2"),
        )
    )
    z, x1, x2 = F.col("z"), F.col("x1"), F.col("x2")
    mom = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(z).alias("sz"),
        F.sum(x1 * z).alias("s1z"),
        F.sum(x2 * z).alias("s2z"),
        F.sum(z * z).alias("szz"),
    )
    b = mom.selectExpr("*", *ADF_B_EXPRS)
    g = b.selectExpr("*", ADF_T_EXPR)
    return g.selectExpr(
        "CAST(n AS BIGINT) AS n_obs",
        "FLOOR(COALESCE(rho_raw, 0.0) * 1e6 + 0.5) / 1e6 AS rho",
        "FLOOR(tstat * 1e4 + 0.5) / 1e4 AS adf_t",
        f"CASE WHEN FLOOR(tstat * 1e4 + 0.5) / 1e4 < {ADF_CRIT_5PCT}"
        " THEN 1 ELSE 0 END AS unit_root_rejected",
    )


# Engle-Granger step 2 runs on the step-1 residual spread; the 5%
# critical value for two variables with constant is about -3.34.
EG_CRIT_5PCT = -3.34
EG_OLS_EXPRS = [
    "(n*sxy - sx*sy) / NULLIF(n*sxx - sx*sx, 0) AS beta",
    "(sy - (n*sxy - sx*sy) / NULLIF(n*sxx - sx*sx, 0) * sx)"
    " / NULLIF(n, 0) AS alpha",
]
_EG_VAR = (
    "(sdd - sed*sed/NULLIF(see, 0)) / NULLIF(m - 1, 0) / NULLIF(see, 0)"
)
EG_T_EXPR = (
    f"CASE WHEN COALESCE({_EG_VAR}, 0) > 0"
    f" THEN (sed / NULLIF(see, 0)) / SQRT({_EG_VAR})"
    f" ELSE 0.0 END AS tstat"
)


@query(
    "stat_cointegration",
    # Real oracle: both day series are integer counts (exact sums);
    # the OLS spread coefficients divide identical operands, so the
    # per-day residuals are bit-identical in both engines; only the
    # ~30-term residual moment sums are order-sensitive, far inside
    # the 1e-4/1e-6 output grids. Shared expression strings again.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t,
                  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END) AS DOUBLE) AS x,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                           END) AS DOUBLE) AS y
               FROM events WHERE event_type IN ('click', 'view')
               GROUP BY 1),
    mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
                   SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
            FROM d),
    ols AS (SELECT mom.*, {", ".join(EG_OLS_EXPRS)} FROM mom),
    e AS (SELECT d.t, d.y - ols.alpha - ols.beta * d.x AS e
          FROM d, ols),
    p AS (SELECT c.e - p1.e AS de, p1.e AS ep
          FROM e c JOIN e p1 ON p1.t = c.t - 1),
    m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m, SUM(ep*ep) AS see,
                  SUM(ep*de) AS sed, SUM(de*de) AS sdd
           FROM p),
    g AS (SELECT m2.*, {EG_T_EXPR} FROM m2),
    o AS (SELECT ols.n AS n, ols.beta AS beta, g.* FROM ols, g)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(COALESCE(beta, 0.0) * 1e6 + 0.5) / 1e6 AS beta,
           FLOOR(COALESCE(sed / NULLIF(see, 0), 0.0) * 1e6 + 0.5) / 1e6
               AS gamma,
           FLOOR(tstat * 1e4 + 0.5) / 1e4 AS eg_t,
           CASE WHEN FLOOR(tstat * 1e4 + 0.5) / 1e4 < {EG_CRIT_5PCT}
                THEN 1 ELSE 0 END AS cointegrated
    FROM o
    """,
)
def stat_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step on the click vs view daily series:
    (1) OLS the view level on the click level; (2) Dickey-Fuller
    (no constant, no lag) on the residual spread. A strongly
    negative t says the spread is stationary — the two series share
    a common trend and the RATIO is monitorable even when each
    series alone is a random walk (where stat_corr would report a
    spurious near-1 correlation). stat_granger asks who FORECASTS
    whom on changes; this asks whether LEVELS are tied at all.

    Scale: one day-grain conditional count per series, OLS moments
    in one aggregation, the residual spread as a broadcast of the
    1-row coefficient frame onto the day grid, one lag self-join.
    All model-sized after the first collapse."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "view")
    )
    d = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "t"
            ),
            "event_type",
        )
        .groupBy("t")
        .agg(
            F.sum((F.col("event_type") == "click").cast("int"))
            .cast("double")
            .alias("x"),
            F.sum((F.col("event_type") == "view").cast("int"))
            .cast("double")
            .alias("y"),
        )
        .localCheckpoint()  # feeds the moment pass and the residual grid
    )
    x, y = F.col("x"), F.col("y")
    mom = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    ols = mom.selectExpr("*", *EG_OLS_EXPRS)
    e = d.crossJoin(F.broadcast(ols.select("n", "alpha", "beta"))).select(
        "t",
        (F.col("y") - F.col("alpha") - F.col("beta") * F.col("x")).alias(
            "e"
        ),
    )
    cur = e.select(F.col("t"), F.col("e").alias("ec"))
    prv = e.select((F.col("t") + 1).alias("t"), F.col("e").alias("ep"))
    p = cur.join(prv, "t").select(
        (F.col("ec") - F.col("ep")).alias("de"), F.col("ep")
    )
    m2 = p.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("ep") * F.col("ep")).alias("see"),
        F.sum(F.col("ep") * F.col("de")).alias("sed"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
    )
    g = m2.selectExpr("*", EG_T_EXPR)
    o = g.crossJoin(F.broadcast(ols.select("n", "beta")))
    return o.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "FLOOR(COALESCE(beta, 0.0) * 1e6 + 0.5) / 1e6 AS beta",
        "FLOOR(COALESCE(sed / NULLIF(see, 0), 0.0) * 1e6 + 0.5) / 1e6"
        " AS gamma",
        "FLOOR(tstat * 1e4 + 0.5) / 1e4 AS eg_t",
        f"CASE WHEN FLOOR(tstat * 1e4 + 0.5) / 1e4 < {EG_CRIT_5PCT}"
        " THEN 1 ELSE 0 END AS cointegrated",
    )
