"""Wave 112: covariate-adjusted group comparison, Holt-Winters
forecasting, and two-model uplift estimation.

stat_ancova compares order-priority mean prices ADJUSTED for a
covariate — the analysis that separates 'priorities differ'
from 'priorities get different quantities'; ev_holt_winters adds the
weekly seasonal component to exponential smoothing (level + trend +
season) and backtests against plain Holt on the held-out week — the
upgrade is only real if the seasonal state earns its keep;
ml_uplift_tlearner is the two-model (T-learner) uplift estimate per
activity segment on the shared synthetic assignment — heterogeneous
treatment effects, the question an overall ATE hides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MUL
from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.extras57 import (
    IPW_ACT_SPLIT,
    IPW_P_HIGH,
    IPW_P_LOW,
)
from mister_spark.registry import query

HW_ALPHA, HW_BETA, HW_GAMMA = 0.3, 0.05, 0.2
HW_SEASON = 7
HW_H = 7


@query(
    "stat_ancova",
    oracle="""
    WITH d AS (SELECT o_orderpriority AS g, o_totalprice AS y,
                      CAST(o_orderkey % 10 AS DOUBLE) AS x
               FROM orders),
    gm AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
                  AVG(x) AS mx, AVG(y) AS my,
                  SUM(x * x) AS sxx, SUM(x * y) AS sxy
           FROM d GROUP BY 1),
    tot AS (SELECT SUM(n) AS nn, SUM(n * mx) / SUM(n) AS gx,
                   SUM(sxx - n * mx * mx) AS wxx,
                   SUM(sxy - n * mx * my) AS wxy
            FROM gm)
    SELECT gm.g,
           CAST(gm.n AS BIGINT) AS n,
           FLOOR(gm.my * 100 + 0.5) / 100 AS raw_mean,
           FLOOR((gm.my - (tot.wxy / tot.wxx) * (gm.mx - tot.gx))
                 * 100 + 0.5) / 100 AS adjusted_mean,
           FLOOR((tot.wxy / tot.wxx) * 10000 + 0.5) / 10000 AS pooled_slope
    FROM gm, tot
    """,
)
def stat_ancova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANCOVA-adjusted group means: order-priority mean prices
    adjusted for a (deterministic pseudo-)covariate (orderkey mod 10) via the pooled
    WITHIN-group slope — adjusted_mean = ȳ_g − b_w(x̄_g − x̄). When
    raw and adjusted means coincide, the covariate wasn't confounding
    the comparison; when they diverge, the raw comparison was partly
    the covariate talking. The adjustment arithmetic is the
    deliverable; the covariate is deliberately noise so raw ≈
    adjusted is the expected — and asserted — read.

    Scale: per-group moments in one shuffle, pooled slope from the
    k-row group frame, adjustment is per-row arithmetic on that
    frame."""
    d = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 10).cast("double").alias("x"),
    )
    gm = d.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = gm.agg(
        F.sum("n").alias("nn"),
        (F.sum(F.col("n") * F.col("mx")) / F.sum("n")).alias("gx"),
        F.sum(F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")).alias(
            "wxx"
        ),
        F.sum(F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")).alias(
            "wxy"
        ),
    )
    slope = F.col("wxy") / F.col("wxx")
    return gm.crossJoin(F.broadcast(tot)).select(
        "g",
        F.col("n").cast("bigint").alias("n"),
        money(F.col("my")).alias("raw_mean"),
        money(
            F.col("my") - slope * (F.col("mx") - F.col("gx"))
        ).alias("adjusted_mean"),
        ratio(slope).alias("pooled_slope"),
    )


@query(
    "ev_holt_winters",
    # Real oracle: both smoothing recursions run as recursive CTEs —
    # Holt carries (level, trend) in a single row per step, and
    # Holt-Winters additionally carries the m-slot seasonal state as a
    # DOUBLE list rebuilt with list_transform each step. Sequential
    # float arithmetic matches the Python loop order exactly, so the
    # final components are bit-identical before rounding.
    oracle=f"""
    WITH RECURSIVE d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                                CAST(COUNT(*) AS DOUBLE) AS y
                         FROM events GROUP BY 1),
    idx AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    hh AS (SELECT LEAST({HW_H},
                        GREATEST(COUNT(*) - {2 * HW_SEASON + 1}, 1)) AS h,
                  COUNT(*) AS n
           FROM idx),
    tn AS (SELECT n - h AS t, h FROM hh),
    trn AS (SELECT i, y FROM idx CROSS JOIN tn WHERE i <= t),
    ho AS (
      SELECT 1 AS i, (SELECT y FROM trn WHERE i = 1) AS lvl,
             CAST(0.0 AS DOUBLE) AS b
      UNION ALL
      SELECT q.i + 1, q.lvl2,
             {HW_BETA} * (q.lvl2 - q.lvl) + (1 - {HW_BETA}) * q.b
      FROM (SELECT w.i, w.lvl, w.b,
                   {HW_ALPHA} * x.y + (1 - {HW_ALPHA}) * (w.lvl + w.b)
                     AS lvl2
            FROM ho w JOIN trn x ON x.i = w.i + 1) q
    ),
    s0 AS (SELECT list(y ORDER BY i) AS sl
           FROM trn WHERE i <= {HW_SEASON}),
    hw AS (
      SELECT {HW_SEASON} AS i,
             (SELECT list_aggregate(sl, 'sum') / {HW_SEASON} FROM s0)
               AS lvl,
             CAST(0.0 AS DOUBLE) AS b,
             (SELECT list_transform(sl,
                x -> x - list_aggregate(sl, 'sum') / {HW_SEASON}) FROM s0)
               AS sea
      UNION ALL
      SELECT q.i + 1, q.lvl2,
             {HW_BETA} * (q.lvl2 - q.lvl) + (1 - {HW_BETA}) * q.b,
             list_transform(range(1, {HW_SEASON} + 1),
               j -> CASE WHEN j = q.pos
                         THEN {HW_GAMMA} * (q.y - q.lvl2)
                              + (1 - {HW_GAMMA}) * q.si
                         ELSE q.sea[j] END)
      FROM (SELECT w.i, w.lvl, w.b, w.sea, x.y,
                   (w.i % {HW_SEASON}) + 1 AS pos,
                   w.sea[(w.i % {HW_SEASON}) + 1] AS si,
                   {HW_ALPHA} * (x.y - w.sea[(w.i % {HW_SEASON}) + 1])
                     + (1 - {HW_ALPHA}) * (w.lvl + w.b) AS lvl2
            FROM hw w JOIN trn x ON x.i = w.i + 1) q
    ),
    hof AS (SELECT lvl, b FROM ho CROSS JOIN tn WHERE i = t),
    hwf AS (SELECT lvl, b, sea FROM hw CROSS JOIN tn WHERE i = t),
    test AS (SELECT x.y AS actual, x.i - tn.t AS j
             FROM idx x CROSS JOIN tn WHERE x.i > tn.t),
    mh AS (SELECT SUM(ABS(f.lvl + f.b * te.j - te.actual))
                  / MAX(tn.h) AS mae
           FROM test te CROSS JOIN hof f CROSS JOIN tn),
    mw AS (SELECT SUM(ABS(f.lvl + f.b * te.j
                          + f.sea[(((SELECT t FROM tn) + te.j - 1)
                                   % {HW_SEASON}) + 1]
                          - te.actual)) / MAX(tn.h) AS mae
           FROM test te CROSS JOIN hwf f CROSS JOIN tn)
    SELECT 'holt' AS model,
           FLOOR(mh.mae * 10000 + 0.5) / 10000 AS mae,
           FLOOR(hwf.lvl * 10000 + 0.5) / 10000 AS final_level,
           FLOOR(hwf.b * 10000 + 0.5) / 10000 AS final_trend
    FROM mh CROSS JOIN hwf
    UNION ALL
    SELECT 'holt_winters',
           FLOOR(mw.mae * 10000 + 0.5) / 10000,
           FLOOR(hwf.lvl * 10000 + 0.5) / 10000,
           FLOOR(hwf.b * 10000 + 0.5) / 10000
    FROM mw CROSS JOIN hwf
    """,
)
def ev_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (level α={a}, trend β={b}, weekly
    seasonal γ={g}, m={m}) on daily event counts, backtested on the
    held-out final week against plain Holt (no seasonal state) — the
    seasonal component must EARN its extra state on the backtest or
    the simpler model wins (and the op says so). Emits per-model MAE
    and the final smoothed components.

    Scale: the rollup is one shuffle; the recursions are O(days)
    driver arithmetic with O(m) state — the same loop a streaming
    deployment carries per key."""
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
    ys = [float(r["y"]) for r in rows]
    n = len(ys)
    h = min(HW_H, max(n - 2 * HW_SEASON - 1, 1))
    train, test = ys[: n - h], ys[n - h :]

    def holt(series):
        lvl, tr = series[0], 0.0
        for y in series[1:]:
            prev = lvl
            lvl = HW_ALPHA * y + (1 - HW_ALPHA) * (lvl + tr)
            tr = HW_BETA * (lvl - prev) + (1 - HW_BETA) * tr
        return [lvl + tr * (j + 1) for j in range(h)]

    def holt_winters(series):
        m = HW_SEASON
        season = [series[i] - sum(series[:m]) / m for i in range(m)]
        lvl = sum(series[:m]) / m
        tr = 0.0
        for i in range(m, len(series)):
            y = series[i]
            prev = lvl
            si = season[i % m]
            lvl = HW_ALPHA * (y - si) + (1 - HW_ALPHA) * (lvl + tr)
            tr = HW_BETA * (lvl - prev) + (1 - HW_BETA) * tr
            season[i % m] = HW_GAMMA * (y - lvl) + (1 - HW_GAMMA) * si
        start = len(series)
        return (
            [
                lvl + tr * (j + 1) + season[(start + j) % m]
                for j in range(h)
            ],
            lvl,
            tr,
        )

    import math

    f_h = holt(train)
    f_hw, lvl, tr = holt_winters(train)
    mae_h = sum(abs(f - a) for f, a in zip(f_h, test)) / h
    mae_hw = sum(abs(f - a) for f, a in zip(f_hw, test)) / h
    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    out = [
        ("holt", r4(mae_h), r4(lvl), r4(tr)),
        ("holt_winters", r4(mae_hw), r4(lvl), r4(tr)),
    ]
    return spark.createDataFrame(
        out, "model string, mae double, final_level double, final_trend double"
    )


ev_holt_winters.__doc__ = ev_holt_winters.__doc__.format(
    a=HW_ALPHA, b=HW_BETA, g=HW_GAMMA, m=HW_SEASON
)


@query(
    "ml_uplift_tlearner",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
                      SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END) AS y
               FROM events GROUP BY 1),
    p AS (SELECT y,
                 CASE WHEN n_ev < {IPW_ACT_SPLIT} THEN 'low' ELSE 'high' END
                   AS segment,
                 CASE WHEN (user_id * {FP_MUL}) % 100 <
                           (CASE WHEN n_ev < {IPW_ACT_SPLIT}
                            THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END)
                      THEN 1 ELSE 0 END AS a
          FROM u),
    g AS (SELECT segment,
                 AVG(CASE WHEN a = 1 THEN y END) AS mu1,
                 AVG(CASE WHEN a = 0 THEN y END) AS mu0,
                 CAST(SUM(a) AS BIGINT) AS n_treated,
                 CAST(SUM(1 - a) AS BIGINT) AS n_control
          FROM p GROUP BY 1)
    SELECT segment, n_treated, n_control,
           FLOOR(mu1 * 100 + 0.5) / 100 AS mean_treated,
           FLOOR(mu0 * 100 + 0.5) / 100 AS mean_control,
           FLOOR((mu1 - mu0) * 100 + 0.5) / 100 AS uplift
    FROM g
    """,
)
def ml_uplift_tlearner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-learner uplift by activity segment on the shared synthetic
    assignment (the ml_ipw_estimate policy, treated = logged): fit
    treated and control outcome models separately per segment (here:
    segment means — the simplest T-learner) and difference them. The
    assignment carries NO causal effect by construction, so per-
    segment uplift near zero is the honest read — and the pattern is
    exactly how heterogeneous effects are estimated when it isn't
    zero.

    Scale: one user rollup, one |segments|-row aggregate."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
    )
    seg = F.when(F.col("n_ev") < IPW_ACT_SPLIT, "low").otherwise("high")
    a = (
        (F.col("user_id") * FP_MUL) % 100
        < F.when(F.col("n_ev") < IPW_ACT_SPLIT, IPW_P_LOW).otherwise(
            IPW_P_HIGH
        )
    ).cast("int")
    p = u.select("y", seg.alias("segment"), a.alias("a"))
    g = p.groupBy("segment").agg(
        F.avg(F.when(F.col("a") == 1, F.col("y"))).alias("mu1"),
        F.avg(F.when(F.col("a") == 0, F.col("y"))).alias("mu0"),
        F.sum("a").cast("bigint").alias("n_treated"),
        F.sum(1 - F.col("a")).cast("bigint").alias("n_control"),
    )
    return g.select(
        "segment",
        "n_treated",
        "n_control",
        money(F.col("mu1")).alias("mean_treated"),
        money(F.col("mu0")).alias("mean_control"),
        money(F.col("mu1") - F.col("mu0")).alias("uplift"),
    )
