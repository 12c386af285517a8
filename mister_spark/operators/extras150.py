"""Wave 150: probability-integral-transform validation and quantile
forecast calibration.

stat_pit_check applies the fitted normal CDF to the data and tests
the result for uniformity — the probability integral transform: if
the model were right, the transformed values would be exactly
uniform, so the residual KS distance IS the model's miscalibration;
ev_quantile_forecast_eval builds per-weekday empirical P10/P90
forecast bands from the training window and measures their ACTUAL
coverage on the held-out week — interval forecasts are only as good
as their calibration, and this measures it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

QF_H = 7  # held-out days


def _norm_cdf_sql(z: str) -> str:
    from mister_spark.functions.special import normal_sf_sql

    return (
        f"(CASE WHEN ({z}) >= 0 THEN 1 - {normal_sf_sql(f'({z})')}"
        f" ELSE {normal_sf_sql(f'(-({z}))')} END)"
    )


@query(
    "stat_pit_check",
    oracle=f"""
    WITH x AS (SELECT c_acctbal AS v FROM customer),
    m AS (SELECT AVG(v) AS mu, STDDEV_SAMP(v) AS sd,
                 CAST(COUNT(*) AS DOUBLE) AS n FROM x),
    u AS (SELECT {_norm_cdf_sql("(v - m.mu) / m.sd")} AS pit
          FROM x, m),
    g AS (SELECT pit, CAST(COUNT(*) AS DOUBLE) AS c FROM u GROUP BY 1),
    e AS (SELECT pit, SUM(c) OVER (ORDER BY pit) AS cum FROM g),
    ks AS (SELECT MAX(ABS(cum / m.n - pit)) AS d FROM e, m)
    SELECT FLOOR((SELECT mu FROM m) * 100 + 0.5) / 100 AS fitted_mu,
           FLOOR((SELECT sd FROM m) * 100 + 0.5) / 100 AS fitted_sd,
           FLOOR(ks.d * 10000 + 0.5) / 10000 AS pit_ks,
           FLOOR(1.3581 / SQRT((SELECT n FROM m)) * 10000 + 0.5) / 10000
             AS ks_crit_05
    FROM ks
    """,
)
def stat_pit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability integral transform check of a normal fit to
    account balances: push every value through the fitted Φ((x−μ)/σ)
    (the engine-shared erf polynomial) and measure the KS distance of
    the transformed sample from Uniform(0,1), next to the 5% KS
    critical value 1.358/√n. PIT-KS above the bar = the normal model
    is provably miscalibrated — and the transform localizes WHERE
    (the worst deviation's location is the bad quantile region).

    Scale: moments in one pass; the PIT is a narrow expression; the
    uniformity ECDF uses the two-phase prefix machinery."""
    from mister_spark.functions.special import normal_sf

    x = cat(spark, sf_dir)["customer"].select(F.col("c_acctbal").alias("v"))
    m = x.agg(
        F.avg("v").alias("mu"),
        F.stddev_samp("v").alias("sd"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    pit = F.when(z >= 0, 1 - normal_sf(z)).otherwise(normal_sf(-z))
    u = x.crossJoin(F.broadcast(m)).select(pit.alias("pit"))
    g = u.groupBy("pit").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "pit", {"cum": F.col("c")})
    ks = e.crossJoin(F.broadcast(m)).agg(
        F.max(F.abs(F.col("cum") / F.col("n") - F.col("pit"))).alias("d"),
        F.first("mu").alias("mu"),
        F.first("sd").alias("sd"),
        F.first("n").alias("n"),
    )
    return ks.select(
        (F.floor(F.col("mu") * 100 + 0.5) / 100).alias("fitted_mu"),
        (F.floor(F.col("sd") * 100 + 0.5) / 100).alias("fitted_sd"),
        ratio(F.col("d")).alias("pit_ks"),
        ratio(1.3581 / F.sqrt(F.col("n"))).alias("ks_crit_05"),
    )


@query(
    "ev_quantile_forecast_eval",
    # Real oracle: the per-weekday train distributions become sorted
    # DOUBLE lists, the custom order-statistic index (int(p·L) with
    # the exact-multiple adjustment, clamped) is mirrored bit-for-bit
    # including its float multiply, and coverage/width are one
    # aggregate over the held-out week.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    idx AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    hh AS (SELECT LEAST({QF_H}, GREATEST(COUNT(*) - 14, 1)) AS h,
                  COUNT(*) AS n
           FROM idx),
    trn AS (SELECT day, y FROM idx CROSS JOIN hh WHERE i <= n - h),
    tst AS (SELECT day, y FROM idx CROSS JOIN hh WHERE i > n - h),
    dowl AS (SELECT (day + 3) % 7 AS dow, list(y ORDER BY y) AS vs
             FROM trn GROUP BY 1),
    alll AS (SELECT list(y ORDER BY y) AS vs FROM trn),
    sc AS (SELECT t.y, COALESCE(dl.vs, al.vs) AS vs
           FROM tst t
           LEFT JOIN dowl dl ON dl.dow = (t.day + 3) % 7
           CROSS JOIN alll al),
    bands AS (SELECT y,
                     vs[GREATEST(0, LEAST(len(vs) - 1,
                          CASE WHEN FLOOR(0.1 * len(vs)) = 0.1 * len(vs)
                               THEN CAST(0.1 * len(vs) AS INT) - 1
                               ELSE CAST(FLOOR(0.1 * len(vs)) AS INT) END))
                        + 1] AS lo,
                     vs[GREATEST(0, LEAST(len(vs) - 1,
                          CASE WHEN FLOOR(0.9 * len(vs)) = 0.9 * len(vs)
                               THEN CAST(0.9 * len(vs) AS INT) - 1
                               ELSE CAST(FLOOR(0.9 * len(vs)) AS INT) END))
                        + 1] AS hi
              FROM sc)
    SELECT CAST(COUNT(*) AS BIGINT) AS test_days,
           0.8 AS nominal_coverage,
           FLOOR(SUM(CASE WHEN lo <= y AND y <= hi THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS achieved_coverage,
           FLOOR(SUM(hi - lo) / COUNT(*) * 10000 + 0.5) / 10000
             AS mean_band_width
    FROM bands
    """,
)
def ev_quantile_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-band forecast calibration: per-weekday empirical
    P10/P90 of daily event counts from the TRAINING window become the
    forecast band for the held-out final week; the op reports nominal
    (80%) vs ACHIEVED coverage and mean band width. Over-coverage
    with a fat band is as much a failure as under-coverage — both are
    visible here.

    Scale: one daily rollup; band construction and scoring are
    O(days) driver arithmetic (calendar-bounded precedent)."""
    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("day")
        .collect()
    )
    days = [int(r["day"]) for r in rows]
    ys = [float(r["y"]) for r in rows]
    n = len(ys)
    h = min(QF_H, max(n - 14, 1))
    train = list(zip(days[: n - h], ys[: n - h]))
    test = list(zip(days[n - h :], ys[n - h :]))
    by_dow: dict[int, list] = {}
    for d, y in train:
        by_dow.setdefault((d + 3) % 7, []).append(y)

    def q(vals, p):
        vs = sorted(vals)
        idx = max(0, min(len(vs) - 1, int(p * len(vs)) - (1 if p * len(vs) == int(p * len(vs)) else 0)))
        return vs[idx]

    covered = 0
    widths = []
    for d, y in test:
        dow = (d + 3) % 7
        vals = by_dow.get(dow) or [v for vs in by_dow.values() for v in vs]
        lo, hi = q(vals, 0.1), q(vals, 0.9)
        widths.append(hi - lo)
        if lo <= y <= hi:
            covered += 1
    import math

    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    row = (
        len(test),
        0.8,
        math.floor(covered / len(test) * 10000 + 0.5) / 10000,
        math.floor(sum(widths) / len(widths) * 10000 + 0.5) / 10000,
    )
    return spark.createDataFrame(
        [row],
        "test_days long, nominal_coverage double, achieved_coverage "
        "double, mean_band_width double",
    )
