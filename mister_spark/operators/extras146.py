"""Wave 146: peaks-over-threshold tail modeling and backfill
manifests.

stat_pot_gpd fits the Generalized Pareto distribution to
exceedances over the exact P95 threshold (method of moments) and
extrapolates a 10×-rarer return level — the EVT machinery (POT
companion to the Hill estimator) that turns 'our biggest order so
far' into 'the order size we should engineer for';
ds_backfill_manifest diffs the observed event days against the full
calendar span and emits the missing-day backfill list — the
actionable twin of ev_stream_health's gap count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

POT_Q = 0.95
POT_RETURN_FACTOR = 10.0  # extrapolate to a 10x-rarer event


@query(
    "stat_pot_gpd",
    oracle=f"""
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
    g AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM x GROUP BY 1),
    e AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM g),
    thr AS (SELECT MIN(v) AS u FROM e, n
            WHERE cum >= CEIL({POT_Q} * n.n)),
    exc AS (SELECT x.v - thr.u AS y FROM x, thr WHERE x.v > thr.u),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, AVG(y) AS my,
                 VAR_SAMP(y) AS vy
          FROM exc),
    fit AS (SELECT k, my, vy,
                   0.5 * (my * my / vy - 1) * -1 AS xi,
                   0.5 * my * (my * my / vy + 1) AS sigma
            FROM m)
    SELECT CAST(fit.k AS BIGINT) AS exceedances,
           FLOOR(thr.u * 100 + 0.5) / 100 AS threshold,
           FLOOR(fit.xi * 10000 + 0.5) / 10000 AS gpd_xi,
           FLOOR(fit.sigma * 100 + 0.5) / 100 AS gpd_sigma,
           FLOOR((thr.u + CASE WHEN ABS(fit.xi) < 1e-6
                               THEN fit.sigma * LN({POT_RETURN_FACTOR})
                               ELSE fit.sigma / fit.xi
                                    * (POW({POT_RETURN_FACTOR}, fit.xi) - 1)
                          END) * 100 + 0.5) / 100 AS return_level
    FROM fit, thr
    """,
)
def stat_pot_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit on order values: exceedances over
    the EXACT P{q} order statistic, method-of-moments shape ξ and
    scale σ (ξ < 0: bounded tail; ξ > 0: heavy), and the {r}×-rarer
    return level u + σ/ξ·({r}^ξ − 1) — what the tail says the next
    order of magnitude looks like, which the sample maximum cannot.

    Scale: the exact threshold uses the two-phase prefix frame; the
    exceedance moments are one filtered aggregate; the fit is
    closed-form."""
    x = cat(spark, sf_dir)["orders"].select(F.col("o_totalprice").alias("v"))
    n = x.agg(F.count(F.lit(1)).cast("double").alias("n"))
    g = x.groupBy("v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "v", {"cum": F.col("c")})
    thr = (
        e.crossJoin(F.broadcast(n))
        .filter(F.col("cum") >= F.ceil(POT_Q * F.col("n")))
        .agg(F.min("v").alias("u"))
    )
    exc = x.crossJoin(F.broadcast(thr)).filter(
        F.col("v") > F.col("u")
    ).select((F.col("v") - F.col("u")).alias("y"), "u")
    m = exc.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.avg("y").alias("my"),
        F.var_samp("y").alias("vy"),
        F.first("u").alias("u"),
    )
    xi = -0.5 * (F.col("my") * F.col("my") / F.col("vy") - 1)
    sigma = 0.5 * F.col("my") * (
        F.col("my") * F.col("my") / F.col("vy") + 1
    )
    rl = F.col("u") + F.when(
        F.abs(xi) < 1e-6, sigma * F.lit(float(__import__("math").log(POT_RETURN_FACTOR)))
    ).otherwise(sigma / xi * (F.pow(F.lit(POT_RETURN_FACTOR), xi) - 1))
    return m.select(
        F.col("k").cast("bigint").alias("exceedances"),
        money(F.col("u")).alias("threshold"),
        ratio(xi).alias("gpd_xi"),
        money(sigma).alias("gpd_sigma"),
        money(rl).alias("return_level"),
    )


stat_pot_gpd.__doc__ = stat_pot_gpd.__doc__.format(
    q=int(POT_Q * 100), r=POT_RETURN_FACTOR
)


@query(
    "ds_backfill_manifest",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    cal AS (SELECT lo + CAST(i AS INTEGER) AS day
            FROM span, generate_series(0, 400) s(i)
            WHERE lo + CAST(i AS INTEGER) <= hi),
    missing AS (SELECT cal.day FROM cal
                LEFT JOIN d ON cal.day = d.day
                WHERE d.day IS NULL)
    SELECT strftime(day, '%Y-%m-%d') AS missing_day,
           CAST(date_diff('day', day,
                          (SELECT hi FROM span)) AS BIGINT) AS age_days
    FROM missing ORDER BY day
    """,
)
def ds_backfill_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill manifest: the explicit list of calendar days inside
    the observed span with ZERO events — each row is one backfill job
    (with its age, to prioritize fresh gaps whose upstream data still
    exists). An empty manifest PROVES continuity; ev_stream_health
    counts the gaps, this op names them.

    Scale: the observed-day set is one distinct rollup; the calendar
    is a sequence expansion against the broadcast span; the diff is
    an anti-join on day."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    span = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day"), "hi"
    )
    missing = cal.join(d, "day", "left_anti")
    return missing.select(
        F.date_format("day", "yyyy-MM-dd").alias("missing_day"),
        F.datediff("hi", "day").cast("bigint").alias("age_days"),
    ).orderBy("missing_day")
