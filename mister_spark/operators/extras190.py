"""Wave 190: extreme-value dependence and volatility clustering.

stat_tail_dependence estimates the empirical copula tail-dependence
coefficients between order quantity and price — do EXTREMES co-occur,
which correlation (a body statistic) cannot answer; joint tail risk
is what actually breaks capacity plans and pricing models.
stat_arch_lm is Engle's ARCH LM test (1982, public literature) on the
daily event-volume series: it regresses SQUARED mean-residuals on
their lag — volatility clustering that stat_ljung_box (autocorrelation
of levels) structurally misses, and the statistic that says whether a
constant-variance monitor threshold is even coherent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

TAIL_Q = 0.95  # upper-tail quantile (lower tail uses 1 - TAIL_Q)


def _tail_thresh_sql(col: str, cmp: str) -> str:
    """Exact empirical quantile of `col` from the distinct-value
    cumulative: the smallest value whose cumulative count reaches
    ceil(q*n) (upper), or ceil((1-q)*n) (lower)."""
    frac = TAIL_Q if cmp == "hi" else 1 - TAIL_Q
    return f"""(SELECT MIN(v) FROM (
        SELECT {col} AS v, SUM(COUNT(*)) OVER (ORDER BY {col}) AS c
        FROM li GROUP BY {col}), nn
      WHERE c >= CEIL({frac!r} * nn.n))"""


@query(
    "stat_tail_dependence",
    # Real oracle: thresholds are exact order statistics from integer
    # cumulative counts; both coefficients are single divisions of
    # exact integer counts — no float path at all before the grid.
    oracle=f"""
    WITH li AS (SELECT l_quantity AS x, l_extendedprice AS y
                FROM lineitem),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li),
    th AS (SELECT
        {_tail_thresh_sql("x", "hi")} AS tx_hi,
        {_tail_thresh_sql("y", "hi")} AS ty_hi,
        {_tail_thresh_sql("x", "lo")} AS tx_lo,
        {_tail_thresh_sql("y", "lo")} AS ty_lo
      FROM nn),
    cnt AS (SELECT
        CAST(SUM(CASE WHEN li.x > th.tx_hi THEN 1 ELSE 0 END) AS BIGINT)
          AS nx_hi,
        CAST(SUM(CASE WHEN li.x > th.tx_hi AND li.y > th.ty_hi
                 THEN 1 ELSE 0 END) AS BIGINT) AS nxy_hi,
        CAST(SUM(CASE WHEN li.x <= th.tx_lo THEN 1 ELSE 0 END) AS BIGINT)
          AS nx_lo,
        CAST(SUM(CASE WHEN li.x <= th.tx_lo AND li.y <= th.ty_lo
                 THEN 1 ELSE 0 END) AS BIGINT) AS nxy_lo
      FROM li, th)
    SELECT nn.n,
           CAST(th.tx_hi AS DOUBLE) AS x_hi_threshold,
           FLOOR(th.ty_hi * 100 + 0.5) / 100 AS y_hi_threshold,
           cnt.nx_hi AS n_x_extreme,
           FLOOR(CAST(cnt.nxy_hi AS DOUBLE) / NULLIF(cnt.nx_hi, 0)
                 * 1e4 + 0.5) / 1e4 AS upper_tail_dep,
           FLOOR(CAST(cnt.nxy_lo AS DOUBLE) / NULLIF(cnt.nx_lo, 0)
                 * 1e4 + 0.5) / 1e4 AS lower_tail_dep
    FROM nn, th, cnt
    """,
)
def stat_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical tail dependence between quantity and price: λ_U =
    P(Y > q95(Y) | X > q95(X)) and λ_L = P(Y ≤ q05(Y) | X ≤ q05(X)).
    Independence puts both near 1 - q = 0.05; values near 1 mean
    extremes travel together — the joint-tail answer correlation (a
    body statistic) cannot give, and the one that matters for
    capacity and risk ('when demand spikes, does spend spike TOO?').

    Scale: each threshold is an exact order statistic off the
    distinct-value frame's two-phase bucketed prefix sum (no global
    sort); the four tail counts are ONE pass with the 1-row threshold
    frame broadcast. Everything before the output grid is integer
    counting."""
    li = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    li = li.localCheckpoint()  # feeds two quantile branches + the count pass
    n = li.count()
    import math

    k_hi, k_lo = math.ceil(TAIL_Q * n), math.ceil((1 - TAIL_Q) * n)

    def col_thresholds(colname: str):
        # ONE cumulative frame per column serves BOTH tail cutoffs
        dv = li.groupBy(colname).agg(F.count(F.lit(1)).alias("w"))
        cum = bucketed_cumsum(dv, colname, {"c": F.col("w")})
        return cum.agg(
            F.min(F.when(F.col("c") >= k_hi, F.col(colname))).alias(
                f"{colname}_hi"
            ),
            F.min(F.when(F.col("c") >= k_lo, F.col(colname))).alias(
                f"{colname}_lo"
            ),
        )

    # ONE row of four exact order statistics; checkpointed because it
    # feeds both the counting pass and the output projection — without
    # the cut each branch replays the quantile subtrees
    th = col_thresholds("x").crossJoin(col_thresholds("y")).localCheckpoint()
    cnt = li.crossJoin(F.broadcast(th)).agg(
        F.sum((F.col("x") > F.col("x_hi")).cast("int"))
        .cast("bigint")
        .alias("nx_hi"),
        F.sum(
            ((F.col("x") > F.col("x_hi")) & (F.col("y") > F.col("y_hi"))).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("nxy_hi"),
        F.sum((F.col("x") <= F.col("x_lo")).cast("int"))
        .cast("bigint")
        .alias("nx_lo"),
        F.sum(
            (
                (F.col("x") <= F.col("x_lo")) & (F.col("y") <= F.col("y_lo"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("nxy_lo"),
    )
    return cnt.crossJoin(F.broadcast(th)).select(
        F.lit(n).cast("bigint").alias("n"),
        F.col("x_hi").cast("double").alias("x_hi_threshold"),
        money(F.col("y_hi")).alias("y_hi_threshold"),
        F.col("nx_hi").alias("n_x_extreme"),
        ratio(
            F.col("nxy_hi").cast("double")
            / F.nullif(F.col("nx_hi"), F.lit(0)).cast("double")
        ).alias("upper_tail_dep"),
        ratio(
            F.col("nxy_lo").cast("double")
            / F.nullif(F.col("nx_lo"), F.lit(0)).cast("double")
        ).alias("lower_tail_dep"),
    )


ARCH_EPOCH = "2024-01-01"


@query(
    "stat_arch_lm",
    # Real oracle: the day-grain counts are integers, the mean
    # residual squares are one pinned expression, and the lag pairing
    # is an integer self-join — the ARCH(1) OLS closed form divides
    # cross-engine-identical sums (1e-6 grid absorbs day-sum order).
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{ARCH_EPOCH}',
                                CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu FROM d),
    s AS (SELECT d.t, (d.y - m.mu) * (d.y - m.mu) AS s2 FROM d, m),
    p AS (SELECT cur.s2 AS sc, prev.s2 AS sp
          FROM s cur JOIN s prev ON prev.t = cur.t - 1),
    mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tt,
                   SUM(sp) AS sx, SUM(sc) AS sy,
                   SUM(sp * sp) AS sxx, SUM(sp * sc) AS sxy,
                   SUM(sc * sc) AS syy
            FROM p),
    f AS (SELECT tt,
                 COALESCE((tt * sxy - sx * sy)
                          / NULLIF(tt * sxx - sx * sx, 0), 0.0) AS b,
                 COALESCE(((tt * sxy - sx * sy) * (tt * sxy - sx * sy))
                          / NULLIF((tt * sxx - sx * sx)
                                   * (tt * syy - sy * sy), 0), 0.0) AS r2
          FROM mom)
    SELECT CAST(tt AS BIGINT) AS t_pairs,
           FLOOR(b * 1e6 + 0.5) / 1e6 AS lag1_coef,
           FLOOR(r2 * 1e6 + 0.5) / 1e6 AS r2,
           FLOOR(tt * r2 * 1e4 + 0.5) / 1e4 AS lm_stat
    FROM f
    """,
)
def stat_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH(1) LM test on daily event volume: center the
    series, square the residuals, regress s²_t on s²_{t-1}; LM =
    T·R² is asymptotically chi-square(1) under constant variance.
    Significant LM = volatility CLUSTERS (calm and turbulent spells),
    so any alerting threshold derived from a single global variance
    is wrong part of the year — the check to run before trusting
    ev_zscore-style monitors. Ljung-Box autocorrelates LEVELS; this
    autocorrelates SQUARES, a different failure mode.

    Scale: ONE day-grain aggregate collapses events to a
    calendar-bounded frame; the lag pairing is an integer self-join
    on that model-sized frame and the OLS is a closed-form moment
    aggregate — no windows, no iteration."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(ARCH_EPOCH).cast("date")).alias(
                "t"
            )
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # feeds the mean branch and both join sides
    )
    m = d.agg(F.avg("y").alias("mu"))
    s = d.crossJoin(F.broadcast(m)).select(
        "t",
        ((F.col("y") - F.col("mu")) * (F.col("y") - F.col("mu"))).alias("s2"),
    )
    cur = s.select(F.col("t"), F.col("s2").alias("sc"))
    prev = s.select((F.col("t") + 1).alias("t"), F.col("s2").alias("sp"))
    p = cur.join(prev, "t")
    mom = p.agg(
        F.count(F.lit(1)).cast("double").alias("tt"),
        F.sum("sp").alias("sx"),
        F.sum("sc").alias("sy"),
        F.sum(F.col("sp") * F.col("sp")).alias("sxx"),
        F.sum(F.col("sp") * F.col("sc")).alias("sxy"),
        F.sum(F.col("sc") * F.col("sc")).alias("syy"),
    )
    tt, sx, sy = F.col("tt"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    # a CONSTANT squared-residual series (e.g. perfectly alternating
    # swings) zeroes the OLS denominator: define b = r2 = 0 there, in
    # both engines (NULLIF/COALESCE — ANSI Spark would error on /0)
    b = F.coalesce(
        (tt * sxy - sx * sy) / F.nullif(tt * sxx - sx * sx, F.lit(0.0)),
        F.lit(0.0),
    )
    r2 = F.coalesce(
        ((tt * sxy - sx * sy) * (tt * sxy - sx * sy))
        / F.nullif((tt * sxx - sx * sx) * (tt * syy - sy * sy), F.lit(0.0)),
        F.lit(0.0),
    )
    return mom.select(
        tt.cast("bigint").alias("t_pairs"),
        rnd(b, 6).alias("lag1_coef"),
        rnd(r2, 6).alias("r2"),
        rnd(tt * r2, 4).alias("lm_stat"),
    )
