"""Wave 108: vector autoregression, doubly-robust off-policy
estimation, and filter-migration shadow evaluation.

ev_var_model fits a VAR(1) to the (click, view) daily series — the
cross-lag matrix that says whether yesterday's views move today's
clicks or vice versa (ev_granger asks IF; this measures HOW MUCH);
ml_doubly_robust combines the IPW correction with an outcome model:
consistent if EITHER the propensities or the outcome model is right
— the two-chances estimator, on the same synthetic logging policy as
ml_ipw_estimate so all three estimators are comparable against the
shipped truth; ds_filter_disagreement shadow-evaluates two quality
filters on the same corpus (agreement matrix + Jaccard) — the report
that decides whether a filter swap is a no-op or a dataset change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras57 import (
    IPW_ACT_SPLIT,
    IPW_P_HIGH,
    IPW_P_LOW,
)
from mister_spark.registry import query

FA_MIN_DISTINCT = 0.3
FB_LEN_LO, FB_LEN_HI = 20, 95


@query(
    "ev_var_model",
    oracle="""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(SUM(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS DOUBLE) AS ck,
                      CAST(SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS DOUBLE) AS vw
               FROM events GROUP BY 1),
    l AS (SELECT ck, vw,
                 LAG(ck) OVER (ORDER BY t) AS lck,
                 LAG(vw) OVER (ORDER BY t) AS lvw
          FROM d),
    x AS (SELECT * FROM l WHERE lck IS NOT NULL),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(lck) AS m1, AVG(lvw) AS m2,
                 AVG(ck) AS yc, AVG(vw) AS yv,
                 SUM(lck * lck) AS s11, SUM(lck * lvw) AS s12,
                 SUM(lvw * lvw) AS s22,
                 SUM(lck * ck) AS c1c, SUM(lvw * ck) AS c2c,
                 SUM(lck * vw) AS c1v, SUM(lvw * vw) AS c2v
          FROM x),
    c AS (SELECT n, m1, m2, yc, yv,
                 s11 - n * m1 * m1 AS a11, s12 - n * m1 * m2 AS a12,
                 s22 - n * m2 * m2 AS a22,
                 c1c - n * m1 * yc AS b1c, c2c - n * m2 * yc AS b2c,
                 c1v - n * m1 * yv AS b1v, c2v - n * m2 * yv AS b2v
          FROM m),
    f AS (SELECT n, m1, m2, yc, yv,
                 (b1c * a22 - b2c * a12) / (a11 * a22 - a12 * a12) AS acc,
                 (b2c * a11 - b1c * a12) / (a11 * a22 - a12 * a12) AS acv,
                 (b1v * a22 - b2v * a12) / (a11 * a22 - a12 * a12) AS avc,
                 (b2v * a11 - b1v * a12) / (a11 * a22 - a12 * a12) AS avv
          FROM c)
    SELECT 'click' AS equation,
           FLOOR(acc * 10000 + 0.5) / 10000 AS coef_lag_click,
           FLOOR(acv * 10000 + 0.5) / 10000 AS coef_lag_view,
           FLOOR((yc - acc * m1 - acv * m2) * 10000 + 0.5) / 10000
             AS intercept
    FROM f
    UNION ALL
    SELECT 'view',
           FLOOR(avc * 10000 + 0.5) / 10000,
           FLOOR(avv * 10000 + 0.5) / 10000,
           FLOOR((yv - avc * m1 - avv * m2) * 10000 + 0.5) / 10000
    FROM f
    """,
)
def ev_var_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAR(1) on the daily (click, view) pair: each series regressed
    on BOTH lagged series (closed-form 2-predictor OLS from moment
    sums) — the cross-lag coefficient matrix behind 'do views lead
    clicks'. Off-diagonal coefficients near zero on this synthetic
    data is the expected read; the machinery is the deliverable.

    Scale: one daily rollup; the lag window rides the
    calendar-bounded day frame; the fit is one moments aggregate and
    closed-form algebra."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "t"
            )
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("double")
            .alias("ck"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("double")
            .alias("vw"),
        )
        .localCheckpoint()
    )
    w = W.orderBy("t")
    x = d.select(
        "ck",
        "vw",
        F.lag("ck").over(w).alias("lck"),
        F.lag("vw").over(w).alias("lvw"),
    ).filter(F.col("lck").isNotNull())
    n = F.count(F.lit(1)).cast("double")
    m = x.agg(
        n.alias("n"),
        F.avg("lck").alias("m1"),
        F.avg("lvw").alias("m2"),
        F.avg("ck").alias("yc"),
        F.avg("vw").alias("yv"),
        F.sum(F.col("lck") * F.col("lck")).alias("s11"),
        F.sum(F.col("lck") * F.col("lvw")).alias("s12"),
        F.sum(F.col("lvw") * F.col("lvw")).alias("s22"),
        F.sum(F.col("lck") * F.col("ck")).alias("c1c"),
        F.sum(F.col("lvw") * F.col("ck")).alias("c2c"),
        F.sum(F.col("lck") * F.col("vw")).alias("c1v"),
        F.sum(F.col("lvw") * F.col("vw")).alias("c2v"),
    )
    nn = F.col("n")
    a11 = F.col("s11") - nn * F.col("m1") * F.col("m1")
    a12 = F.col("s12") - nn * F.col("m1") * F.col("m2")
    a22 = F.col("s22") - nn * F.col("m2") * F.col("m2")
    b1c = F.col("c1c") - nn * F.col("m1") * F.col("yc")
    b2c = F.col("c2c") - nn * F.col("m2") * F.col("yc")
    b1v = F.col("c1v") - nn * F.col("m1") * F.col("yv")
    b2v = F.col("c2v") - nn * F.col("m2") * F.col("yv")
    det = a11 * a22 - a12 * a12
    acc = (b1c * a22 - b2c * a12) / det
    acv = (b2c * a11 - b1c * a12) / det
    avc = (b1v * a22 - b2v * a12) / det
    avv = (b2v * a11 - b1v * a12) / det
    eq_c = m.select(
        F.lit("click").alias("equation"),
        ratio(acc).alias("coef_lag_click"),
        ratio(acv).alias("coef_lag_view"),
        ratio(F.col("yc") - acc * F.col("m1") - acv * F.col("m2")).alias(
            "intercept"
        ),
    )
    eq_v = m.select(
        F.lit("view").alias("equation"),
        ratio(avc).alias("coef_lag_click"),
        ratio(avv).alias("coef_lag_view"),
        ratio(F.col("yv") - avc * F.col("m1") - avv * F.col("m2")).alias(
            "intercept"
        ),
    )
    return eq_c.unionByName(eq_v)


@query(
    "ml_doubly_robust",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
                      SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END) AS y
               FROM events GROUP BY 1),
    p AS (SELECT user_id, y,
                 CASE WHEN n_ev < {IPW_ACT_SPLIT} THEN 1 ELSE 0 END AS low,
                 CASE WHEN n_ev < {IPW_ACT_SPLIT}
                      THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END / 100.0 AS pc,
                 CASE WHEN (user_id * {FP_MUL}) % 100 <
                           (CASE WHEN n_ev < {IPW_ACT_SPLIT}
                            THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END)
                      THEN 1 ELSE 0 END AS a
          FROM u),
    mu AS (SELECT low, AVG(CASE WHEN a = 1 THEN y END) AS mu_hat
           FROM p GROUP BY 1),
    j AS (SELECT p.*, mu.mu_hat FROM p JOIN mu ON p.low = mu.low),
    s AS (SELECT AVG(y) AS true_mean,
                 SUM(CASE WHEN a = 1 THEN y END) / NULLIF(SUM(a), 0)
                   AS naive,
                 SUM(a * y / pc) / SUM(a / pc) AS ipw,
                 AVG(mu_hat + a * (y - mu_hat) / pc) AS dr
          FROM j)
    SELECT FLOOR(naive * 10000 + 0.5) / 10000 AS naive,
           FLOOR(ipw * 10000 + 0.5) / 10000 AS ipw,
           FLOOR(dr * 10000 + 0.5) / 10000 AS dr,
           FLOOR(true_mean * 10000 + 0.5) / 10000 AS true_mean
    FROM s
    """,
)
def ml_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust estimate of mean purchase value under the same
    biased logging policy as ml_ipw_estimate: outcome model μ̂(x) =
    logged-rows mean per activity stratum, then
    DR = mean[μ̂ + a·(y−μ̂)/p]. Consistent if EITHER the propensity OR
    the outcome model is correct — here both are, so naive is off and
    ipw/dr both land near the shipped truth, with DR the lower
    variance of the two. The estimator trio makes the comparison
    auditable in one row.

    Scale: one user rollup, a 2-row outcome model broadcast back, one
    sufficient-statistics aggregate."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
    )
    low = F.when(F.col("n_ev") < IPW_ACT_SPLIT, 1).otherwise(0)
    pc = (
        F.when(F.col("n_ev") < IPW_ACT_SPLIT, IPW_P_LOW).otherwise(IPW_P_HIGH)
        / 100.0
    )
    a = (
        (F.col("user_id") * FP_MUL) % 100
        < F.when(F.col("n_ev") < IPW_ACT_SPLIT, IPW_P_LOW).otherwise(
            IPW_P_HIGH
        )
    ).cast("int")
    p = u.select(
        "user_id", "y", low.alias("low"), pc.alias("pc"), a.alias("a")
    ).localCheckpoint()
    mu = p.groupBy("low").agg(
        F.avg(F.when(F.col("a") == 1, F.col("y"))).alias("mu_hat")
    )
    j = p.join(F.broadcast(mu), "low")
    dr = F.avg(
        F.col("mu_hat")
        + F.col("a") * (F.col("y") - F.col("mu_hat")) / F.col("pc")
    )
    return j.agg(
        ratio(
            F.sum(F.when(F.col("a") == 1, F.col("y")))
            / F.sum("a")
        ).alias("naive"),
        ratio(
            F.sum(F.col("a") * F.col("y") / F.col("pc"))
            / F.sum(F.col("a") / F.col("pc"))
        ).alias("ipw"),
        ratio(dr).alias("dr"),
        ratio(F.avg("y")).alias("true_mean"),
    )


@query(
    "ds_filter_disagreement",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      CAST(len({DUCK_TOKENS}) AS DOUBLE) AS tok,
                      CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                        AS dis
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    g AS (SELECT doc_id,
                 CASE WHEN dis / tok >= {FA_MIN_DISTINCT}
                      THEN 1 ELSE 0 END AS fa,
                 CASE WHEN tok BETWEEN {FB_LEN_LO} AND {FB_LEN_HI}
                      THEN 1 ELSE 0 END AS fb
          FROM t)
    SELECT CAST(SUM(fa * fb) AS BIGINT) AS both_pass,
           CAST(SUM(fa * (1 - fb)) AS BIGINT) AS only_a,
           CAST(SUM((1 - fa) * fb) AS BIGINT) AS only_b,
           CAST(SUM((1 - fa) * (1 - fb)) AS BIGINT) AS neither,
           FLOOR(CAST(SUM(fa * fb) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN fa = 1 OR fb = 1
                              THEN 1 ELSE 0 END), 0)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM g
    """,
)
def ds_filter_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shadow evaluation of two quality filters on the same corpus —
    A: distinct-token ratio ≥ {a}; B: token length in [{lo}, {hi}] —
    as the 2×2 agreement matrix plus the Jaccard of their keep-sets.
    The migration question is never 'is the new filter good' but 'on
    WHICH documents does it disagree' — this is that report.

    Scale: both filters are narrow JVM expressions over one scan; the
    matrix is a 1-row aggregate."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select(
            F.size(toks).cast("double").alias("tok"),
            F.size(F.array_distinct(toks)).cast("double").alias("dis"),
        )
        .filter(F.col("tok") > 0)
    )
    fa = (F.col("dis") / F.col("tok") >= FA_MIN_DISTINCT).cast("long")
    fb = (
        (F.col("tok") >= FB_LEN_LO) & (F.col("tok") <= FB_LEN_HI)
    ).cast("long")
    g = t.select(fa.alias("fa"), fb.alias("fb"))
    union = F.sum(
        F.when((F.col("fa") == 1) | (F.col("fb") == 1), 1).otherwise(0)
    )
    return g.agg(
        F.sum(F.col("fa") * F.col("fb")).cast("bigint").alias("both_pass"),
        F.sum(F.col("fa") * (1 - F.col("fb")))
        .cast("bigint")
        .alias("only_a"),
        F.sum((1 - F.col("fa")) * F.col("fb"))
        .cast("bigint")
        .alias("only_b"),
        F.sum((1 - F.col("fa")) * (1 - F.col("fb")))
        .cast("bigint")
        .alias("neither"),
        ratio(
            F.sum(F.col("fa") * F.col("fb")).cast("double") / union
        ).alias("jaccard"),
    )


ds_filter_disagreement.__doc__ = ds_filter_disagreement.__doc__.format(
    a=FA_MIN_DISTINCT, lo=FB_LEN_LO, hi=FB_LEN_HI
)
