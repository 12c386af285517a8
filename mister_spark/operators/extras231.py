"""Wave 231: interaction strength and revenue co-movement betas.

ml_friedman_h computes Friedman's H-squared for the (weekday,
priority) pair on the ml_hist_tree model — the share of the joint
partial-dependence variance NOT explained by the two one-feature
PDPs. Because the features are bounded grids and the tree is
piecewise constant (wave-222's observation), the usual sampled
estimate collapses to exact leaf-mean algebra: H2 = 0 says the
surface is additive and the PDP curves tell the whole story; H2
large says reading either PDP alone is a lie. The missing number
under every PDP plot. fin_revenue_beta regresses each nation's
daily revenue on the GLOBAL daily book: beta = how hard the nation
swings with the total, alpha = its idiosyncratic drift, r2 = how
much of its variance the global factor explains — the portfolio
decomposition (systematic vs idiosyncratic) applied to business
units, one closed form per nation from a single panel pass.

Exactness: H2 is leaf-mean x marginal-count algebra on the shared
fit replay; betas are integer-cent panel sums through shared OLS
closed forms, both on the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras88 import _best_split, _hist_stats
from mister_spark.operators.extras222 import _LEAF_CASE, _TREE_FIT_SQL
from mister_spark.registry import query

EPOCH = "1970-01-01"


@query(
    "ml_friedman_h",
    # Real oracle: the fit chain and leaf case are wave 222's
    # verbatim; the joint surface, both marginal PDPs and the
    # variance decomposition are exact weighted sums over the
    # (f1, f2) grid with cell-count weights, on the rounding grid.
    oracle=f"""
    WITH {_TREE_FIT_SQL},
    lfv AS (SELECT dn.y, {_LEAF_CASE.format(v1="dn.f1", v2="dn.f2")}
                     AS leaf
            FROM dn CROSS JOIN s0
                    LEFT JOIN s1 a ON a.node = 1
                    LEFT JOIN s1 b ON b.node = 2),
    preds AS (SELECT leaf, AVG(y) AS p FROM lfv GROUP BY leaf),
    m1 AS (SELECT f1, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1),
    m2 AS (SELECT f2, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1),
    nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    grid AS (SELECT m1.f1, m2.f2, m1.c AS c1, m2.c AS c2,
                    {_LEAF_CASE.format(v1="m1.f1", v2="m2.f2")} AS leaf
             FROM m1 CROSS JOIN m2 CROSS JOIN s0
             LEFT JOIN s1 a ON a.node = 1
             LEFT JOIN s1 b ON b.node = 2),
    joint AS (SELECT g.f1, g.f2, g.c1, g.c2, p.p AS fj
              FROM grid g JOIN preds p ON p.leaf = g.leaf),
    pd1 AS (SELECT f1, SUM(c2 * fj) / nt.n AS v
            FROM joint, nt GROUP BY f1, nt.n),
    pd2 AS (SELECT f2, SUM(c1 * fj) / nt.n AS v
            FROM joint, nt GROUP BY f2, nt.n),
    mu AS (SELECT SUM(c1 * c2 * fj) / (nt.n * nt.n) AS m
           FROM joint, nt GROUP BY nt.n),
    h AS (SELECT SUM(j.c1 * j.c2
                     * (j.fj - p1.v - p2.v + mu.m)
                     * (j.fj - p1.v - p2.v + mu.m)) AS num,
                 SUM(j.c1 * j.c2 * (j.fj - mu.m) * (j.fj - mu.m))
                   AS den
          FROM joint j JOIN pd1 p1 ON p1.f1 = j.f1
               JOIN pd2 p2 ON p2.f2 = j.f2, mu)
    SELECT (SELECT CAST(n AS BIGINT) FROM nt) AS n_rows,
           FLOOR((SELECT m FROM mu) * 100 + 0.5) / 100 AS mean_pred,
           FLOOR(CASE WHEN h.den <= 0 THEN 0.0
                      ELSE h.num / h.den END * 1e4 + 0.5) / 1e4
             AS h_squared,
           FLOOR(SQRT(CASE WHEN h.den <= 0 THEN 0.0
                      ELSE h.num / h.den END) * 1e4 + 0.5) / 1e4
             AS h_statistic
    FROM h
    """,
)
def ml_friedman_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's H for (weekday, priority) on the hist-tree model:
    H2 = sum w * (F(x1,x2) - PD1(x1) - PD2(x2) + mean)^2 /
    sum w * (F - mean)^2 over the product-weighted feature grid —
    the interaction share of the prediction surface's variance,
    computed EXACTLY (bounded grids + piecewise-constant model, no
    Monte-Carlo). H ~ 0 certifies the PDP curves as the whole story;
    H large means per-feature curves mislead and the 2-D surface
    must be read. The honesty check every PDP should ship with
    (ml_partial_dependence draws the curves; this says whether
    they're sufficient).

    Scale: the same two histogram passes as the fit plus marginal
    aggregates; all H algebra lives on the |f1| x |f2| grid."""
    d = (
        cat(spark, sf_dir)["orders"]
        .select(
            (((F.dayofweek("o_orderdate") + 5) % 7) + 1)
            .cast("long")
            .alias("f1"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("f2"),
            F.col("o_totalprice").alias("y"),
        )
        .localCheckpoint()
    )
    s0 = _best_split(_hist_stats(d, F.lit(0)), 0)
    _, feat0, thr0 = s0
    node1 = F.when(F.col(feat0) <= thr0, 1).otherwise(2)
    l1_rows = _hist_stats(d, node1)
    splits = {}
    for node in (1, 2):
        s = _best_split(l1_rows, node)
        if s is not None and s[0] > 0:
            splits[node] = s

    def leaf_of(v1: int, v2: int) -> int:
        pick = {"f1": v1, "f2": v2}
        if pick[feat0] <= thr0:
            if 1 in splits:
                _, f2_, t = splits[1]
                return 3 if pick[f2_] <= t else 4
            return 1
        if 2 in splits:
            _, f2_, t = splits[2]
            return 5 if pick[f2_] <= t else 6
        return 2

    leaf_expr = F.when(
        F.col(feat0) <= thr0,
        F.when(F.col(splits[1][1]) <= splits[1][2], 3).otherwise(4)
        if 1 in splits
        else F.lit(1),
    ).otherwise(
        F.when(F.col(splits[2][1]) <= splits[2][2], 5).otherwise(6)
        if 2 in splits
        else F.lit(2),
    )
    preds = {
        r["leaf"]: r["p"]
        for r in d.groupBy(leaf_expr.alias("leaf"))
        .agg(F.avg("y").alias("p"))
        .collect()
    }
    m1 = {
        r["f1"]: r["c"]
        for r in d.groupBy("f1")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    }
    m2 = {
        r["f2"]: r["c"]
        for r in d.groupBy("f2")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    }
    n = sum(m1.values())
    import math

    fj = {
        (v1, v2): preds[leaf_of(v1, v2)]
        for v1 in sorted(m1)
        for v2 in sorted(m2)
    }
    pd1 = {
        v1: sum(m2[v2] * fj[(v1, v2)] for v2 in sorted(m2)) / n
        for v1 in sorted(m1)
    }
    pd2 = {
        v2: sum(m1[v1] * fj[(v1, v2)] for v1 in sorted(m1)) / n
        for v2 in sorted(m2)
    }
    mu = (
        sum(
            m1[v1] * m2[v2] * fj[(v1, v2)]
            for v1 in sorted(m1)
            for v2 in sorted(m2)
        )
        / (n * n)
    )
    num = sum(
        m1[v1]
        * m2[v2]
        * (fj[(v1, v2)] - pd1[v1] - pd2[v2] + mu) ** 2
        for v1 in sorted(m1)
        for v2 in sorted(m2)
    )
    den = sum(
        m1[v1] * m2[v2] * (fj[(v1, v2)] - mu) ** 2
        for v1 in sorted(m1)
        for v2 in sorted(m2)
    )
    h2 = 0.0 if den <= 0 else num / den
    g = lambda x, s_: math.floor(x * s_ + 0.5) / s_  # noqa: E731
    return spark.createDataFrame(
        [(int(n), g(mu, 100), g(h2, 1e4), g(math.sqrt(h2), 1e4))],
        "n_rows long, mean_pred double, h_squared double, "
        "h_statistic double",
    )


@query(
    "fin_revenue_beta",
    # Real oracle: the (nation, day) panel sums in integer cents,
    # the global book is their exact total, and every per-nation
    # beta/alpha/r2 is the same OLS closed form on the grid, ordered
    # by rounded beta with name tiebreak.
    oracle=f"""
    WITH cell AS (SELECT c.c_nationkey AS z,
                         date_diff('day', DATE '{EPOCH}',
                                   CAST(o.o_orderdate AS DATE)) AS t,
                         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100
                              + 0.5) AS BIGINT)) AS BIGINT) AS cents
                  FROM orders o JOIN customer c
                       ON o.o_custkey = c.c_custkey
                  GROUP BY 1, 2),
    days AS (SELECT t FROM cell GROUP BY t),
    mkt AS (SELECT t, CAST(SUM(cents) AS DOUBLE) / 100 AS m
            FROM cell GROUP BY 1),
    mm AS (SELECT AVG(m) AS mbar,
                  SUM(m * m) - COUNT(*) * AVG(m) * AVG(m) AS smm,
                  CAST(COUNT(*) AS DOUBLE) AS nd
           FROM mkt),
    full_panel AS (SELECT z.z, d.t,
                          CAST(COALESCE(cell.cents, 0) AS DOUBLE) / 100
                            AS y
                   FROM (SELECT DISTINCT z FROM cell) z
                   CROSS JOIN days d
                   LEFT JOIN cell ON cell.z = z.z AND cell.t = d.t),
    per AS (SELECT fp.z, AVG(fp.y) AS ybar,
                   SUM(fp.y * mkt.m) - COUNT(*) * AVG(fp.y) * AVG(mkt.m)
                     AS sym,
                   SUM(fp.y * fp.y) - COUNT(*) * AVG(fp.y) * AVG(fp.y)
                     AS syy
            FROM full_panel fp JOIN mkt ON mkt.t = fp.t
            GROUP BY fp.z),
    o AS (SELECT per.z, per.ybar,
                 per.sym / mm.smm AS beta,
                 per.ybar - per.sym / mm.smm * mm.mbar AS alpha,
                 CASE WHEN per.syy <= 0 THEN 0.0
                      ELSE (per.sym * per.sym) / (mm.smm * per.syy)
                 END AS r2
          FROM per, mm)
    SELECT n.n_name AS nation,
           FLOOR(o.beta * 1e4 + 0.5) / 1e4 AS beta,
           FLOOR(o.alpha * 100 + 0.5) / 100 AS alpha,
           FLOOR(o.r2 * 1e4 + 0.5) / 1e4 AS r2
    FROM o JOIN nation n ON n.n_nationkey = o.z
    ORDER BY FLOOR(o.beta * 1e4 + 0.5) DESC, n.n_name
    """,
)
def fin_revenue_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue beta against the global daily book: on the
    gap-filled (nation, day) panel, beta = cov(nation, market)/
    var(market), alpha the idiosyncratic level, r2 the systematic
    share. beta > 1 nations amplify global swings (watch them in a
    downturn); r2 near 0 flags units whose revenue moves to its own
    drummer — diversification that is real, not assumed. CAPM's
    decomposition pointed at business units, one panel pass.

    Scale: one fact aggregation to the dimension x calendar panel
    (integer cents); the market frame and per-nation sums are
    closed-form joins on that bounded frame."""
    cell = (
        cat(spark, sf_dir)["orders"]
        .join(
            F.broadcast(
                cat(spark, sf_dir)["customer"].select(
                    "c_custkey", F.col("c_nationkey").alias("z")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "z",
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit(EPOCH)
            ).alias("t"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("z", "t")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()
    )
    days = cell.select("t").distinct().localCheckpoint()
    mkt = cell.groupBy("t").agg(
        (F.sum("cents").cast("double") / 100).alias("m")
    ).localCheckpoint()
    mm = mkt.agg(
        F.avg("m").alias("mbar"),
        (
            F.sum(F.col("m") * F.col("m"))
            - F.count(F.lit(1)) * F.avg("m") * F.avg("m")
        ).alias("smm"),
    )
    zs = cell.select("z").distinct()
    fp = (
        zs.crossJoin(F.broadcast(days))
        .join(cell, ["z", "t"], "left")
        .select(
            "z", "t",
            (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100).alias(
                "y"
            ),
        )
    )
    per = (
        fp.join(F.broadcast(mkt), "t")
        .groupBy("z")
        .agg(
            F.avg("y").alias("ybar"),
            (
                F.sum(F.col("y") * F.col("m"))
                - F.count(F.lit(1)) * F.avg("y") * F.avg("m")
            ).alias("sym"),
            (
                F.sum(F.col("y") * F.col("y"))
                - F.count(F.lit(1)) * F.avg("y") * F.avg("y")
            ).alias("syy"),
        )
    )
    nat = cat(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("z"), "n_name"
    )
    beta = F.col("sym") / F.col("smm")
    return (
        per.crossJoin(F.broadcast(mm))
        .join(F.broadcast(nat), "z")
        .select(
            F.col("n_name").alias("nation"),
            rnd(beta, 4).alias("beta"),
            rnd(F.col("ybar") - beta * F.col("mbar"), 2).alias("alpha"),
            rnd(
                F.when(F.col("syy") <= 0, F.lit(0.0)).otherwise(
                    (F.col("sym") * F.col("sym"))
                    / (F.col("smm") * F.col("syy"))
                ),
                4,
            ).alias("r2"),
        )
        .orderBy(F.floor(F.col("beta") * 1e4 + 0.5).desc(), "nation")
    )
