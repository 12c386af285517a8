"""Wave 221: VaR backtesting and automatic elbow selection.

fin_var_backtest closes the loop fin_expected_shortfall opens: take
the 5% empirical VaR of daily revenue CHANGES, mark the breach days,
and test the breach series two ways — Kupiec's proportion-of-
failures LR (right NUMBER of breaches?) and Christoffersen's
independence LR on the breach-indicator Markov transitions (breaches
CLUSTERED?). A VaR that fails the second while passing the first is
the classic silent risk: right on average, wrong exactly when it
matters. ml_kneedle_elbow answers "what k?" mechanically: sweep a
deterministic 1-D weighted k-means over the $500 order-value grid
for k = 1..8 (fixed seeds, fixed Lloyd rounds, replayed exactly),
normalize the inertia curve, and pick the Kneedle knee — the point
of maximum gap above the diagonal — so cluster-count selection is a
reproducible operator instead of a analyst's squint.

Exactness: breach counts and Markov cells are integers off an exact
order-statistic VaR on integer-cent sums; the k-means recursion
carries centroid lists with identical assign/update arithmetic in
both engines and the knee argmax reads the 1e-6 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
VAR_PCT = 5  # VaR level, percent (lower tail of daily changes)
KN_BUCKET = 500  # order-value grid step
KN_KMAX = 8  # k sweep upper bound
KN_ITERS = 10  # Lloyd rounds per k


@query(
    "fin_var_backtest",
    # Real oracle: day revenues sum in integer cents, the VaR is an
    # exact order statistic at rank floor(p*n)+1 of the change
    # series, breach indicators and Markov cells are integers, and
    # both LRs + their chi-square tails (exp / normal_sf closed
    # forms) evaluate identical expressions.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}',
                      CAST(l_shipdate AS DATE)) AS t,
                      CAST(SUM(CAST(FLOOR(l_extendedprice
                           * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                           AS BIGINT) AS cents
               FROM lineitem GROUP BY 1),
    ch AS (SELECT t, (cents - LAG(cents) OVER (ORDER BY t)) / 100.0
                    AS chg
           FROM d QUALIFY LAG(cents) OVER (ORDER BY t) IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ch),
    v AS (SELECT chg AS var5 FROM (
            SELECT chg, ROW_NUMBER() OVER (ORDER BY chg, t) AS rk
            FROM ch), n
          WHERE rk = CAST(FLOOR({VAR_PCT} / 100.0 * n) AS BIGINT) + 1),
    b AS (SELECT t, CASE WHEN chg < v.var5 THEN 1 ELSE 0 END AS br
          FROM ch, v),
    tr AS (SELECT br, LAG(br) OVER (ORDER BY t) AS pb FROM b),
    cells AS (SELECT CAST(SUM(CASE WHEN pb = 0 AND br = 0 THEN 1
                             ELSE 0 END) AS DOUBLE) AS n00,
                     CAST(SUM(CASE WHEN pb = 0 AND br = 1 THEN 1
                             ELSE 0 END) AS DOUBLE) AS n01,
                     CAST(SUM(CASE WHEN pb = 1 AND br = 0 THEN 1
                             ELSE 0 END) AS DOUBLE) AS n10,
                     CAST(SUM(CASE WHEN pb = 1 AND br = 1 THEN 1
                             ELSE 0 END) AS DOUBLE) AS n11,
                     CAST(SUM(br) AS BIGINT) AS x
              FROM tr),
    k AS (SELECT n.n, cells.x, v.var5,
                 CAST(cells.x AS DOUBLE) / n.n AS pihat,
                 {VAR_PCT} / 100.0 AS p,
                 cells.n00, cells.n01, cells.n10, cells.n11
          FROM n, cells, v),
    lr AS (SELECT k.*,
                  -2 * ((n - x) * LN(1 - p) + x * LN(p)
                        - CASE WHEN pihat <= 0 OR pihat >= 1 THEN
                               (n - x) * LN(1 - p) + x * LN(p)
                          ELSE (n - x) * LN(1 - pihat)
                               + x * LN(pihat) END) AS lr_pof,
                  CASE WHEN n01 + n11 = 0 OR n00 + n10 = 0
                         OR n01 * n11 = 0 THEN 0.0
                  ELSE -2 * ((n00 + n10) * LN(1 - (n01 + n11)
                               / (n00 + n01 + n10 + n11))
                             + (n01 + n11) * LN((n01 + n11)
                               / (n00 + n01 + n10 + n11))
                             - (n00 * LN(n00 / (n00 + n01))
                                + n01 * LN(n01 / (n00 + n01))
                                + n10 * LN(n10 / (n10 + n11))
                                + n11 * LN(n11 / (n10 + n11))))
                  END AS lr_ind
           FROM k)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(var5 * 100 + 0.5) / 100 AS var_5pct,
           x AS n_breaches,
           FLOOR(p * n * 100 + 0.5) / 100 AS expected_breaches,
           FLOOR(lr_pof * 1e4 + 0.5) / 1e4 AS kupiec_lr,
           FLOOR(2 * {normal_sf_sql("SQRT(GREATEST(lr_pof, 0.0))")}
                 * 1e6 + 0.5) / 1e6 AS kupiec_p,
           FLOOR(lr_ind * 1e4 + 0.5) / 1e4 AS christoffersen_lr,
           FLOOR(2 * {normal_sf_sql("SQRT(GREATEST(lr_ind, 0.0))")}
                 * 1e6 + 0.5) / 1e6 AS independence_p
    FROM lr
    """,
)
def fin_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest the {p}% VaR of daily revenue changes: breaches are
    days the change undershoots the exact order-statistic VaR;
    Kupiec's POF LR tests the breach COUNT against the nominal rate
    and Christoffersen's LR tests breach INDEPENDENCE on the 2x2
    Markov transition cells (clustered breaches = the model misses
    regime shifts even if the long-run rate is right). Both tails
    are chi-square(1) via the shared normal closed form. The audit
    every risk number should ship with — fin_expected_shortfall
    states the VaR; this says whether history believes it.

    Scale: ONE fact aggregation to integer-cent day revenue; the
    change series, order-statistic VaR, breach windows and 2x2 cells
    all live on the calendar-bounded frame."""
    d = (
        cat(spark, sf_dir)["lineitem"]
        .select(
            F.datediff(
                F.to_date("l_shipdate"), F.lit(EPOCH).cast("date")
            ).alias("t"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("t")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()  # calendar-bounded day frame
    )
    ch = (
        d.select(
            "t",
            (
                (F.col("cents") - F.lag("cents").over(W.orderBy("t")))
                / 100.0
            ).alias("chg"),
        )
        .filter(F.col("chg").isNotNull())
        .localCheckpoint()  # feeds quantile, breaches
    )
    n = ch.agg(F.count(F.lit(1)).alias("n"))
    v = (
        ch.select(
            "chg", F.row_number().over(W.orderBy("chg", "t")).alias("rk")
        )
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("rk")
            == F.floor(VAR_PCT / 100.0 * F.col("n")).cast("bigint") + 1
        )
        .select(F.col("chg").alias("var5"))
    )
    b = ch.crossJoin(F.broadcast(v)).select(
        "t", F.when(F.col("chg") < F.col("var5"), 1).otherwise(0).alias("br")
    )
    tr = b.select("br", F.lag("br").over(W.orderBy("t")).alias("pb"))
    cells = tr.agg(
        *[
            F.sum(
                F.when((F.col("pb") == a) & (F.col("br") == bb), 1).otherwise(
                    0
                )
            )
            .cast("double")
            .alias(f"n{a}{bb}")
            for a in (0, 1)
            for bb in (0, 1)
        ],
        F.sum("br").cast("bigint").alias("x"),
    )
    k = (
        n.crossJoin(F.broadcast(cells))
        .crossJoin(F.broadcast(v))
        .select(
            "n", "x", "var5", "n00", "n01", "n10", "n11",
            (F.col("x").cast("double") / F.col("n")).alias("pihat"),
            F.lit(VAR_PCT / 100.0).alias("p"),
        )
    )
    null_ll = (F.col("n") - F.col("x")) * F.log(1 - F.col("p")) + F.col(
        "x"
    ) * F.log(F.col("p"))
    alt_ll = F.when(
        (F.col("pihat") <= 0) | (F.col("pihat") >= 1), null_ll
    ).otherwise(
        (F.col("n") - F.col("x")) * F.log(1 - F.col("pihat"))
        + F.col("x") * F.log(F.col("pihat"))
    )
    lr_pof = -2 * (null_ll - alt_ll)
    ntot = F.col("n00") + F.col("n01") + F.col("n10") + F.col("n11")
    pi1 = (F.col("n01") + F.col("n11")) / ntot
    lr_ind = F.when(
        (F.col("n01") + F.col("n11") == 0)
        | (F.col("n00") + F.col("n10") == 0)
        | (F.col("n01") * F.col("n11") == 0),
        F.lit(0.0),
    ).otherwise(
        -2
        * (
            (F.col("n00") + F.col("n10")) * F.log(1 - pi1)
            + (F.col("n01") + F.col("n11")) * F.log(pi1)
            - (
                F.col("n00") * F.log(F.col("n00") / (F.col("n00") + F.col("n01")))
                + F.col("n01") * F.log(F.col("n01") / (F.col("n00") + F.col("n01")))
                + F.col("n10") * F.log(F.col("n10") / (F.col("n10") + F.col("n11")))
                + F.col("n11") * F.log(F.col("n11") / (F.col("n10") + F.col("n11")))
            )
        )
    )
    return k.select(
        F.col("n").cast("bigint").alias("n_days"),
        rnd(F.col("var5"), 2).alias("var_5pct"),
        F.col("x").alias("n_breaches"),
        rnd(F.col("p") * F.col("n"), 2).alias("expected_breaches"),
        rnd(lr_pof, 4).alias("kupiec_lr"),
        rnd(2 * normal_sf(F.sqrt(F.greatest(lr_pof, F.lit(0.0)))), 6).alias(
            "kupiec_p"
        ),
        rnd(lr_ind, 4).alias("christoffersen_lr"),
        rnd(2 * normal_sf(F.sqrt(F.greatest(lr_ind, F.lit(0.0)))), 6).alias(
            "independence_p"
        ),
    )


fin_var_backtest.__doc__ = fin_var_backtest.__doc__.format(p=VAR_PCT)


def _kneedle_oracle() -> str:
    """1-D weighted k-means inertia sweep replayed per k as a
    recursive CTE carrying the centroid list, then the Kneedle knee
    on the normalized inertia curve."""
    return f"""
    WITH RECURSIVE g AS (
      SELECT CAST(FLOOR(o_totalprice / {KN_BUCKET}) AS DOUBLE) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    gr AS (SELECT v, c, ROW_NUMBER() OVER (ORDER BY v) AS rk FROM g),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM gr),
    ks AS (SELECT unnest(generate_series(1, {KN_KMAX})) AS k),
    -- seeds: POSITIONALLY, one list element per j = 1..k at rank
    -- ((2j-1) m) // (2k) + 1 (integer division, matching the Python
    -- side exactly). An IN-filter over the ranks would DEDUPE
    -- colliding seeds and hand back fewer than k centroids whenever
    -- the value grid has m < ~2k cells; the positional build keeps
    -- duplicates like the Spark side does.
    km AS (
      SELECT ks.k, 0 AS it,
             (SELECT list(
                (SELECT gr.v FROM gr, nc
                 WHERE gr.rk = ((2 * jj.j - 1) * nc.m) // (2 * ks.k) + 1)
                ORDER BY jj.j)
              FROM (SELECT unnest(generate_series(1, {KN_KMAX})) AS j)
                   jj WHERE jj.j <= ks.k) AS cents
      FROM ks
      UNION ALL
      -- spine over centroid indices + LEFT lateral per index: a
      -- centroid that attracts no cells KEEPS its value (matching
      -- the Spark side) instead of silently vanishing from the list
      SELECT base.k, base.it + 1 AS it,
             list(COALESCE(agg.nv, c2.cj) ORDER BY c2.j)
      FROM (SELECT km.k, km.it, km.cents FROM km
            WHERE km.it < {KN_ITERS}) base
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(base.cents))) AS j,
               unnest(base.cents) AS cj) c2
      LEFT JOIN LATERAL (
        SELECT SUM(q.v * q.c) / SUM(q.c) AS nv
        FROM (
          SELECT gr.v, gr.c,
                 (SELECT sj.j FROM (
                    SELECT unnest(generate_series(1,
                      len(base.cents))) AS j) sj
                  ORDER BY ABS(gr.v - base.cents[sj.j]), sj.j
                  LIMIT 1) AS bj
          FROM gr) q
        WHERE q.bj = c2.j) agg ON TRUE
      GROUP BY base.k, base.it),
    inert AS (
      SELECT km.k,
             SUM(gr.c * (gr.v - km.cents[
               (SELECT sj.j FROM (
                  SELECT unnest(generate_series(1,
                    len(km.cents))) AS j) sj
                ORDER BY ABS(gr.v - km.cents[sj.j]), sj.j
                LIMIT 1)])
               * (gr.v - km.cents[
               (SELECT sj.j FROM (
                  SELECT unnest(generate_series(1,
                    len(km.cents))) AS j) sj
                ORDER BY ABS(gr.v - km.cents[sj.j]), sj.j
                LIMIT 1)])) AS inertia
      FROM km CROSS JOIN gr
      WHERE km.it = {KN_ITERS}
      GROUP BY km.k),
    mm AS (SELECT MIN(inertia) AS lo, MAX(inertia) AS hi FROM inert),
    curve AS (SELECT i.k,
                     (i.k - 1) / ({KN_KMAX} - 1.0) AS xn,
                     CASE WHEN mm.hi <= mm.lo THEN 0.0
                          ELSE (i.inertia - mm.lo) / (mm.hi - mm.lo)
                     END AS yn,
                     i.inertia
              FROM inert i, mm),
    kneedle AS (SELECT k, inertia, (1 - xn) - yn AS gap FROM curve)
    SELECT curve.k,
           FLOOR(curve.inertia * 1e4 + 0.5) / 1e4 AS inertia,
           FLOOR((SELECT gap FROM kneedle kk WHERE kk.k = curve.k)
                 * 1e6 + 0.5) / 1e6 AS kneedle_gap,
           (SELECT k FROM kneedle
            ORDER BY FLOOR(gap * 1e6 + 0.5) DESC, k LIMIT 1)
             AS knee_k
    FROM curve
    """


@query("ml_kneedle_elbow", oracle=_kneedle_oracle())
def ml_kneedle_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic elbow selection: deterministic 1-D weighted k-means
    (quantile-ranked seeds, {it} Lloyd rounds, lowest-index tie-
    break) over the $500 order-value grid for k = 1..{kmax}, then the
    Kneedle rule on the normalized inertia curve — knee_k is the k
    whose curve point sits farthest ABOVE the diagonal, i.e. where
    adding a cluster stops paying. Turns the scree-plot squint into
    a reproducible operator any pipeline can gate on.

    Scale: ONE grid-collapse aggregation bounds everything; the
    whole k sweep runs on the |cells| x k frames (model-sized). The
    oracle replays every Lloyd round as a recursive CTE carrying the
    centroid list."""
    g_rows = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.floor(F.col("o_totalprice") / KN_BUCKET)
            .cast("double")
            .alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy("v")
        .collect()  # bounded value grid (documented model-sized)
    )
    vs = [r["v"] for r in g_rows]
    cs = [r["c"] for r in g_rows]
    m = len(vs)
    out = []
    inertias = []
    for k in range(1, KN_KMAX + 1):
        cents = [
            vs[int((2 * j - 1) * m // (2 * k))] for j in range(1, k + 1)
        ]
        for _ in range(KN_ITERS):
            sums = [0.0] * k
            wts = [0] * k
            for v, c in zip(vs, cs):
                j = min(
                    range(k), key=lambda jj: (abs(v - cents[jj]), jj)
                )
                sums[j] += v * c
                wts[j] += c
            cents = [
                sums[j] / wts[j] if wts[j] else cents[j] for j in range(k)
            ]
        inertia = 0.0
        for v, c in zip(vs, cs):
            j = min(range(k), key=lambda jj: (abs(v - cents[jj]), jj))
            inertia += c * (v - cents[j]) * (v - cents[j])
        inertias.append(inertia)
    lo, hi = min(inertias), max(inertias)
    import math

    gaps = []
    for k in range(1, KN_KMAX + 1):
        xn = (k - 1) / (KN_KMAX - 1.0)
        yn = 0.0 if hi <= lo else (inertias[k - 1] - lo) / (hi - lo)
        gaps.append((1 - xn) - yn)
    gf = lambda x, s: math.floor(x * s + 0.5) / s  # noqa: E731
    knee = min(
        range(1, KN_KMAX + 1),
        key=lambda k: (-math.floor(gaps[k - 1] * 1e6 + 0.5), k),
    )
    for k in range(1, KN_KMAX + 1):
        out.append(
            (k, gf(inertias[k - 1], 1e4), gf(gaps[k - 1], 1e6), knee)
        )
    return spark.createDataFrame(
        out, "k long, inertia double, kneedle_gap double, knee_k long"
    )


ml_kneedle_elbow.__doc__ = ml_kneedle_elbow.__doc__.format(
    it=KN_ITERS, kmax=KN_KMAX
)
