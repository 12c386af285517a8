"""Wave 96: restricted mean survival, higher-order array SQL surface,
and seasonal-strength scoring.

ml_survival_rmst turns the Kaplan-Meier curve into the ONE number a
decision needs — expected hours-to-conversion restricted to a τ-hour
horizon (area under the KM step curve), robust where the median is
undefined under heavy censoring; sql_higher_order_arrays pins the
higher-order array-function surface (transform / filter / aggregate /
exists / zip_with) that keeps per-group sequence logic JVM-side
instead of in Python UDFs; stat_seasonal_strength compresses
ev_seasonal_decompose's components into the 0–1 'how seasonal is this
series' score that decides whether a seasonal model is worth its
complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

RMST_TAU = 72  # horizon (hours)
HOF_TOP = 20
DAY_US = 86400000000
TREND_HALF = 3
DETR_GRID = 10000


@query(
    "ml_survival_rmst",
    oracle=f"""
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts)) AS t0,
                      MIN(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS tp,
                      MAX(epoch_us(ts)) AS t1
               FROM events GROUP BY 1),
    lab AS (SELECT (COALESCE(tp, t1) - t0) // 3600000000 AS t,
                   CASE WHEN tp IS NULL THEN 1 ELSE 0 END AS cens
            FROM u),
    n0 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
    gt AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS c,
                  CAST(SUM(1 - cens) AS DOUBLE) AS d
           FROM lab GROUP BY 1),
    rk AS (SELECT t, d,
                  n0.n - (SUM(c) OVER (ORDER BY t) - c) AS r
           FROM gt, n0),
    km AS (SELECT t,
                  EXP(SUM(LN(1 - d / r)) OVER (ORDER BY t)) AS s,
                  LEAD(t) OVER (ORDER BY t) AS nt
           FROM rk WHERE d < r),
    seg AS (
      SELECT MIN(t) AS t_first FROM km),
    area AS (
      SELECT SUM(CASE WHEN t >= {RMST_TAU} THEN 0
                      ELSE s * (LEAST(COALESCE(nt, {RMST_TAU}), {RMST_TAU})
                                - t) END) AS tail_area
      FROM km)
    SELECT FLOOR((LEAST(seg.t_first, {RMST_TAU}) + area.tail_area)
                 * 10000 + 0.5) / 10000 AS rmst_hours,
           CAST({RMST_TAU} AS BIGINT) AS tau
    FROM seg, area
    """,
)
def ml_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time for hours-to-first-purchase
    (τ = {tau} h): the area under the Kaplan–Meier step curve up to
    τ — 'on average a user spends X of the first {tau} hours
    unconverted'. Defined even when censoring makes the median
    survival undefined, which is why trials report it. Clock and
    censoring match stat_logrank_test exactly.

    Scale: durations collapse to |distinct t| rows in one shuffle;
    the at-risk prefix is `bucketed_cumsum`; the KM product and the
    area ride the hour-bounded frame (calendar-bounded — the
    day-frame precedent)."""
    ev = cat(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
        F.max(us).alias("t1"),
    )
    lab = u.select(
        F.floor(
            (F.coalesce("tp", F.col("t1")) - F.col("t0")) / 3600000000
        )
        .cast("long")
        .alias("t"),
        F.when(F.col("tp").isNull(), 1).otherwise(0).alias("cens"),
    )
    n0 = lab.agg(F.count(F.lit(1)).cast("double").alias("n"))
    gt = lab.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum(1 - F.col("cens")).cast("double").alias("d"),
    )
    cc = bucketed_cumsum(gt, "t", {"cum": F.col("c")})
    rk = cc.crossJoin(F.broadcast(n0)).select(
        "t",
        "d",
        (F.col("n") - (F.col("cum") - F.col("c"))).alias("r"),
    ).filter(F.col("d") < F.col("r"))
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    km = rk.select(
        "t",
        F.exp(F.sum(F.log(1 - F.col("d") / F.col("r"))).over(w)).alias("s"),
        F.lead("t").over(W.orderBy("t")).alias("nt"),
    ).localCheckpoint()
    seg = km.agg(F.min("t").alias("t_first"))
    area = km.agg(
        F.sum(
            F.when(F.col("t") >= RMST_TAU, 0.0).otherwise(
                F.col("s")
                * (
                    F.least(
                        F.coalesce("nt", F.lit(RMST_TAU)), F.lit(RMST_TAU)
                    )
                    - F.col("t")
                )
            )
        ).alias("tail_area")
    )
    return seg.crossJoin(F.broadcast(area)).select(
        ratio(
            F.least(F.col("t_first"), F.lit(RMST_TAU)) + F.col("tail_area")
        ).alias("rmst_hours"),
        F.lit(RMST_TAU).cast("bigint").alias("tau"),
    )


ml_survival_rmst.__doc__ = ml_survival_rmst.__doc__.format(tau=RMST_TAU)


@query(
    "sql_higher_order_arrays",
    oracle=f"""
    WITH li AS (SELECT l_orderkey, l_extendedprice AS p, l_discount AS d,
                       l_quantity AS q
                FROM lineitem),
    agg AS (SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   FLOOR(SUM(p * (1 - d)) * 100 + 0.5) / 100 AS sum_disc,
                   CAST(CASE WHEN SUM(CASE WHEN p > 50000 THEN 1 ELSE 0 END)
                             > 0 THEN 1 ELSE 0 END AS BIGINT) AS any_big,
                   FLOOR(SUM(p * q) * 100 + 0.5) / 100 AS dot_pq
            FROM li GROUP BY 1)
    SELECT * FROM agg ORDER BY l_orderkey LIMIT {HOF_TOP}
    """,
)
def sql_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface: per order, collect the
    line arrays once and compute everything with JVM lambdas —
    transform (discounted prices), aggregate (their sum), exists
    (any price > 50k), zip_with (price·quantity dot product). The
    oracle computes the identical numbers relationally, proving the
    array pipeline is semantics-preserving. This is the idiom that
    keeps per-group sequence logic OUT of Python UDFs.

    Scale: one groupBy(orderkey) shuffle builds the arrays (basket
    sizes are bounded); every lambda is whole-stage-codegen
    JVM code on the collected arrays."""
    li = cat(spark, sf_dir)["lineitem"].select(
        "l_orderkey",
        F.col("l_extendedprice").alias("p"),
        F.col("l_discount").alias("d"),
        F.col("l_quantity").alias("q"),
    )
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("p", "d", "q"))
        ).alias("lines")
    )
    prices = F.transform(F.col("lines"), lambda s: s["p"])
    disc = F.transform(F.col("lines"), lambda s: s["p"] * (1 - s["d"]))
    qtys = F.transform(F.col("lines"), lambda s: s["q"])
    sum_arr = lambda a: F.aggregate(  # noqa: E731
        a, F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        g.select(
            "l_orderkey",
            F.size("lines").cast("bigint").alias("n_items"),
            money(sum_arr(disc)).alias("sum_disc"),
            F.exists(prices, lambda x: x > 50000)
            .cast("bigint")
            .alias("any_big"),
            money(
                sum_arr(F.zip_with(prices, qtys, lambda a, b: a * b))
            ).alias("dot_pq"),
        )
        .orderBy("l_orderkey")
        .limit(HOF_TOP)
    )


@query(
    "stat_seasonal_strength",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
               FROM events GROUP BY 1),
    tr AS (SELECT day, vc,
                  AVG(CAST(vc AS DOUBLE)) OVER
                    (ORDER BY day RANGE BETWEEN {TREND_HALF} PRECEDING
                     AND {TREND_HALF} FOLLOWING) AS trend
           FROM d),
    de AS (SELECT (day + 3) % 7 + 1 AS dow,
                  CAST(FLOOR((vc - trend) * {DETR_GRID} / 100.0 + 0.5)
                       AS BIGINT) AS detr_g
           FROM tr),
    sfac AS (SELECT dow, AVG(CAST(detr_g AS DOUBLE)) AS seas
             FROM de GROUP BY 1),
    r AS (SELECT de.detr_g - sfac.seas AS resid, de.detr_g
          FROM de JOIN sfac ON de.dow = sfac.dow)
    SELECT FLOOR(VAR_SAMP(CAST(detr_g AS DOUBLE)) / {DETR_GRID}
                 / {DETR_GRID} * 10000 + 0.5) / 10000 AS var_detrended,
           FLOOR(VAR_SAMP(resid) / {DETR_GRID} / {DETR_GRID}
                 * 10000 + 0.5) / 10000 AS var_resid,
           FLOOR(GREATEST(1 - VAR_SAMP(resid)
                          / VAR_SAMP(CAST(detr_g AS DOUBLE)), 0)
                 * 10000 + 0.5) / 10000 AS seasonal_strength
    FROM r
    """,
)
def stat_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength score of daily revenue: with the classical
    decomposition (7-day centered trend, day-of-week factors — the
    exact ev_seasonal_decompose construction), strength =
    max(0, 1 − Var(residual)/Var(detrended)) ∈ [0,1]. Above ~0.6
    a seasonal model earns its keep; near 0 the weekday factors are
    noise — one number instead of eyeballing the factor table.

    Scale: identical plan shape to ev_seasonal_decompose (daily
    rollup, calendar-bounded day frame, 7-row factor broadcast),
    plus one variance aggregate."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.groupBy((F.unix_micros("ts") / DAY_US).cast("long").alias("day"))
        .agg(
            F.floor(F.sum("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc")
        )
        .localCheckpoint()
    )
    wt = W.orderBy("day").rangeBetween(-TREND_HALF, TREND_HALF)
    tr = d.select(
        "day",
        "vc",
        F.avg(F.col("vc").cast("double")).over(wt).alias("trend"),
    )
    de = tr.select(
        ((F.col("day") + 3) % 7 + 1).alias("dow"),
        F.floor((F.col("vc") - F.col("trend")) * DETR_GRID / 100.0 + 0.5)
        .cast("bigint")
        .alias("detr_g"),
    ).localCheckpoint()
    sfac = de.groupBy("dow").agg(
        F.avg(F.col("detr_g").cast("double")).alias("seas")
    )
    r = de.join(F.broadcast(sfac), "dow").select(
        (F.col("detr_g") - F.col("seas")).alias("resid"),
        F.col("detr_g").cast("double").alias("dg"),
    )
    g2 = float(DETR_GRID) * float(DETR_GRID)
    return r.agg(
        ratio(F.var_samp("dg") / g2).alias("var_detrended"),
        ratio(F.var_samp("resid") / g2).alias("var_resid"),
        ratio(
            F.greatest(
                1 - F.var_samp("resid") / F.var_samp("dg"), F.lit(0.0)
            )
        ).alias("seasonal_strength"),
    )
