"""Wave 106: paired testing (parametric and exact-sign) and piecewise
regression.

stat_paired_ttest compares each customer's first-half vs second-half
spend WITH the pairing (the within-customer differencing that
removes between-customer variance — the reason paired designs need
far fewer subjects than two-sample ones); stat_sign_test is its
distribution-free twin — only the SIGN of each customer's change,
with the shared normal tail for the p-value; ml_spline_regression
fits a piecewise-linear spline (hinge basis at quantile knots) by
closed-form least squares from one sufficient-statistics pass — the
nonlinearity upgrade that stays a single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.duck_linalg import duck_spd_solve
from mister_spark.registry import query

SPLIT_DATE = "1998-01-01"  # mid-corpus split for the paired designs
SPLINE_KNOTS = (15.0, 30.0, 40.0)  # l_quantity hinge knots


_PAIR_SQL = f"""
    p AS (SELECT o_custkey,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}'
                          THEN o_totalprice ELSE 0 END) AS first_half,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
                          THEN o_totalprice ELSE 0 END) AS second_half,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}'
                          THEN 1 ELSE 0 END) AS n1,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
                          THEN 1 ELSE 0 END) AS n2
          FROM orders GROUP BY 1),
    d AS (SELECT second_half - first_half AS diff FROM p
          WHERE n1 > 0 AND n2 > 0)
"""


@query(
    "stat_paired_ttest",
    oracle=f"""
    WITH {_PAIR_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS pairs,
           FLOOR(AVG(diff) * 100 + 0.5) / 100 AS mean_diff,
           FLOOR(AVG(diff) / (STDDEV_SAMP(diff) / SQRT(COUNT(*)))
                 * 10000 + 0.5) / 10000 AS t_stat
    FROM d
    """,
)
def stat_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-customer spend change across the
    {s} split (customers active in BOTH halves): t = d̄/(s_d/√n) on
    the within-customer differences. The pairing removes
    between-customer spend variance entirely — the design that makes
    before/after questions answerable at a fraction of the sample a
    two-sample test needs.

    Scale: one customer rollup (conditional sums — a single shuffle),
    then a 1-row aggregate of the differences."""
    orders = cat(spark, sf_dir)["orders"]
    split = F.lit(SPLIT_DATE).cast("timestamp")
    p = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < split, F.col("o_totalprice")).otherwise(
                0.0
            )
        ).alias("first_half"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= split, F.col("o_totalprice")
            ).otherwise(0.0)
        ).alias("second_half"),
        F.sum(F.when(F.col("o_orderdate") < split, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("o_orderdate") >= split, 1).otherwise(0)).alias(
            "n2"
        ),
    )
    d = p.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        (F.col("second_half") - F.col("first_half")).alias("diff")
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("pairs"),
        money(F.avg("diff")).alias("mean_diff"),
        ratio(
            F.avg("diff")
            / (F.stddev_samp("diff") / F.sqrt(F.count(F.lit(1))))
        ).alias("t_stat"),
    )


stat_paired_ttest.__doc__ = stat_paired_ttest.__doc__.format(s=SPLIT_DATE)


@query(
    "stat_sign_test",
    oracle=f"""
    WITH {_PAIR_SQL},
    s AS (SELECT CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS pos,
                 CAST(SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nz
          FROM d),
    z AS (SELECT pos, nz,
                 (pos - nz / 2) / SQRT(nz / 4) AS zs
          FROM s)
    SELECT CAST(nz AS BIGINT) AS nonzero_pairs,
           CAST(pos AS BIGINT) AS increased,
           FLOOR(zs * 10000 + 0.5) / 10000 AS z,
           FLOOR(2 * {normal_sf_sql("ABS(zs)")} * 10000 + 0.5) / 10000
             AS p_two_sided
    FROM z
    """,
)
def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign test on the same paired spend changes: only the SIGN of
    each customer's change is used — no normality, no symmetry, no
    outlier sensitivity; z = (pos − n/2)/√(n/4) with the shared
    normal tail for the two-sided p. The test to trust when the
    paired t's assumptions are the question.

    Scale: identical plan to stat_paired_ttest plus one 1-row
    arithmetic step."""
    orders = cat(spark, sf_dir)["orders"]
    split = F.lit(SPLIT_DATE).cast("timestamp")
    p = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < split, F.col("o_totalprice")).otherwise(
                0.0
            )
        ).alias("first_half"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= split, F.col("o_totalprice")
            ).otherwise(0.0)
        ).alias("second_half"),
        F.sum(F.when(F.col("o_orderdate") < split, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("o_orderdate") >= split, 1).otherwise(0)).alias(
            "n2"
        ),
    )
    d = p.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        (F.col("second_half") - F.col("first_half")).alias("diff")
    )
    s = d.agg(
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("double")
        .alias("pos"),
        F.sum(F.when(F.col("diff") != 0, 1).otherwise(0))
        .cast("double")
        .alias("nz"),
    )
    zs = (F.col("pos") - F.col("nz") / 2) / F.sqrt(F.col("nz") / 4)
    return s.select(
        F.col("nz").cast("bigint").alias("nonzero_pairs"),
        F.col("pos").cast("bigint").alias("increased"),
        ratio(zs).alias("z"),
        ratio(2 * normal_sf(F.abs(zs))).alias("p_two_sided"),
    )


@query(
    "ml_spline_regression",
    # Real oracle: the 5×5 hinge-basis normal equations assembled from
    # the same sufficient sums and solved by the shared Cholesky
    # recursion; the 2×2 line fit is inline Cramer. Slopes/RMSE land
    # on the operator's rounding grids.
    oracle=f"""
    WITH RECURSIVE
    li AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
                  CAST(l_extendedprice AS DOUBLE) AS y
           FROM lineitem),
    fx AS (SELECT [CAST(1.0 AS DOUBLE), x,
                   GREATEST(x - 15.0, 0.0), GREATEST(x - 30.0, 0.0),
                   GREATEST(x - 40.0, 0.0)] AS f, y
           FROM li),
    st AS (SELECT p.i AS i, p.j AS j, SUM(f[p.i] * f[p.j]) AS g
           FROM fx CROSS JOIN LATERAL (
             SELECT i.i AS i, j.j AS j
             FROM (SELECT unnest(range(1, 6)) AS i) i,
                  (SELECT unnest(range(1, 6)) AS j) j) p
           GROUP BY p.i, p.j),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
        SELECT i, list(g ORDER BY j) AS row FROM st GROUP BY i) z),
    xy AS (SELECT list(s ORDER BY i) AS v FROM (
        SELECT u.i AS i, SUM(f[u.i] * y) AS s
        FROM fx CROSS JOIN LATERAL (SELECT unnest(range(1, 6)) AS i) u
        GROUP BY u.i) z),
    rhs AS (SELECT [v] AS b FROM xy),
    nyy AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(y * y) AS yy
            FROM fx),
    {duck_spd_solve(5, 1)},
    fit AS (SELECT sol.x[1] AS beta,
                   nyy.yy - list_aggregate(list_transform(range(1, 6),
                     i -> sol.x[1][i] * xy.v[i]), 'sum') AS sse_spline,
                   m.a[1][1] * m.a[2][2] - m.a[1][2] * m.a[2][1] AS det,
                   (xy.v[1] * m.a[2][2] - m.a[1][2] * xy.v[2]) AS w0n,
                   (m.a[1][1] * xy.v[2] - m.a[2][1] * xy.v[1]) AS w1n,
                   nyy.n AS n, nyy.yy AS yy
            FROM sol CROSS JOIN xy CROSS JOIN nyy CROSS JOIN mat m),
    fin AS (SELECT beta, sse_spline, n,
                   yy - (w0n / det * (SELECT v[1] FROM xy)
                         + w1n / det * (SELECT v[2] FROM xy)) AS sse_line
            FROM fit)
    SELECT CAST(s.seg AS BIGINT) AS segment,
           s.lo AS x_lo, s.hi AS x_hi,
           FLOOR((beta[2] + COALESCE(list_aggregate(
             list_transform(range(3, s.seg + 3), k -> beta[k]), 'sum'),
             0.0)) * 1e4 + 0.5) / 1e4 AS slope,
           FLOOR(SQRT(sse_spline / n) * 1e4 + 0.5) / 1e4 AS rmse_spline,
           FLOOR(SQRT(sse_line / n) * 1e4 + 0.5) / 1e4 AS rmse_line
    FROM fin CROSS JOIN (VALUES (0, 0.0, 15.0), (1, 15.0, 30.0),
                                (2, 30.0, 40.0), (3, 40.0, 1e9))
      AS s(seg, lo, hi)
    """,
)
def ml_spline_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-linear spline regression of extendedprice on
    quantity with hinge basis max(0, x−k) at knots {k}: the design
    matrix is [1, x, h1, h2, h3]; the fit comes from ONE pass of
    XᵀX / Xᵀy sufficient statistics and a driver-side 5×5 solve —
    nonlinear in x, still closed-form, still a single aggregate.
    Emits per-segment slopes (the spline's derivative between knots)
    plus train RMSE vs the straight-line fit. pytest replays the
    solve in numpy and pins RMSE(spline) ≤ RMSE(line).

    Scale: the sufficient statistics are O(p²)=25 doubles per
    partition — model-sized; two scans total (stats + RMSE)."""
    import numpy as np

    li = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    ).localCheckpoint()
    feats = [F.lit(1.0), F.col("x")] + [
        F.greatest(F.col("x") - k, F.lit(0.0)) for k in SPLINE_KNOTS
    ]
    p = len(feats)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(feats[i] * feats[j]).alias(f"xx_{i}_{j}"))
        aggs.append(F.sum(feats[i] * F.col("y")).alias(f"xy_{i}"))
    aggs.append(F.sum(F.col("y") * F.col("y")).alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = li.agg(*aggs).collect()[0]
    XX = np.zeros((p, p))
    Xy = np.zeros(p)
    for i in range(p):
        for j in range(i, p):
            XX[i, j] = XX[j, i] = row[f"xx_{i}_{j}"]
        Xy[i] = row[f"xy_{i}"]
    beta = np.linalg.solve(XX, Xy)
    n = float(row["n"])
    sse_spline = float(row["yy"] - beta @ Xy)
    # straight-line fit from the same stats (sub-matrix)
    XX2, Xy2 = XX[:2, :2], Xy[:2]
    b2 = np.linalg.solve(XX2, Xy2)
    sse_line = float(row["yy"] - b2 @ Xy2)
    # segment slopes: derivative accumulates hinge coefficients
    import math

    bounds = [0.0] + list(SPLINE_KNOTS)
    out = []
    for seg in range(len(bounds)):
        # slope as the oracle computes it: beta[1] + Σ hinge coefs,
        # left-to-right (identical double arithmetic both engines)
        slope = beta[1]
        for k in range(seg):
            slope = slope + beta[2 + k]
        lo = bounds[seg]
        hi = bounds[seg + 1] if seg + 1 < len(bounds) else float("inf")
        out.append(
            (
                seg,
                lo,
                hi if hi != float("inf") else 1e9,
                math.floor(float(slope) * 1e4 + 0.5) / 1e4,
                math.floor((sse_spline / n) ** 0.5 * 1e4 + 0.5) / 1e4,
                math.floor((sse_line / n) ** 0.5 * 1e4 + 0.5) / 1e4,
            )
        )
    return spark.createDataFrame(
        out,
        "segment long, x_lo double, x_hi double, slope double, "
        "rmse_spline double, rmse_line double",
    )


ml_spline_regression.__doc__ = ml_spline_regression.__doc__.format(
    k=SPLINE_KNOTS
)
