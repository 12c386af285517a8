"""Wave 237: odds-ratio homogeneity and robust multivariate centers.

stat_breslow_day is the question stat_mantel_haenszel LEAVES OPEN:
MH pools the per-stratum odds ratios into one number, which is only
honest if the stratum ORs agree. Breslow-Day tests exactly that —
per stratum, solve the quadratic for the expected exposed-case cell
under the pooled OR, and chi-square the observed deviations. A
significant BD means "don't report one OR; the effect differs by
stratum" — the gate every stratified analysis should pass before
quoting MH. stat_geometric_median computes the Weiszfeld geometric
median of the daily (total events, purchase events) cloud next to
the component mean: the L1 multivariate center a handful of outlier
days cannot drag, with the mean-to-median displacement as the
outlier-influence reading (the 2-D answer to what stat_mad does in
one dimension).

Exactness: BD cells are integers, the pooled OR and each quadratic
root are shared closed forms; Weiszfeld replays a fixed-round
recursion carrying the center with identical guard arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
GM_ITERS = 50


@query(
    "stat_breslow_day",
    # Real oracle: 2x2 cells per weekday stratum are integers, the
    # MH pooled OR, each stratum's quadratic root (guarded at
    # |psi - 1| < 1e-12) and the Wilson-Hilferty tail are identical
    # closed forms on the grid.
    oracle=f"""
    WITH d AS (SELECT ((dayofweek(o_orderdate) + 6) % 7) + 1
                     AS stratum,
                     CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                          ELSE 0 END AS e,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS y
              FROM orders),
    s AS (SELECT stratum,
                 CAST(SUM(e * y) AS DOUBLE) AS a,
                 CAST(SUM(e * (1 - y)) AS DOUBLE) AS b,
                 CAST(SUM((1 - e) * y) AS DOUBLE) AS c,
                 CAST(SUM((1 - e) * (1 - y)) AS DOUBLE) AS dd,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM d GROUP BY 1),
    mh AS (SELECT SUM(a * dd / n) / SUM(b * c / n) AS psi FROM s),
    q AS (SELECT s.stratum, s.a, s.n, s.a + s.b AS m1, s.a + s.c AS k1,
                 mh.psi,
                 CASE WHEN ABS(mh.psi - 1) < 1e-12
                      THEN (s.a + s.b) * (s.a + s.c) / s.n
                      ELSE ((mh.psi * ((s.a + s.b) + (s.a + s.c))
                             + (s.n - (s.a + s.b) - (s.a + s.c)))
                            - SQRT((mh.psi * ((s.a + s.b) + (s.a + s.c))
                                    + (s.n - (s.a + s.b) - (s.a + s.c)))
                                   * (mh.psi * ((s.a + s.b) + (s.a + s.c))
                                      + (s.n - (s.a + s.b) - (s.a + s.c)))
                                   - 4 * (mh.psi - 1) * mh.psi
                                     * (s.a + s.b) * (s.a + s.c)))
                           / (2 * (mh.psi - 1)) END AS at
          FROM s, mh),
    bd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                  SUM((a - at) * (a - at)
                      * (1 / at + 1 / (m1 - at) + 1 / (k1 - at)
                         + 1 / (n - m1 - k1 + at))) AS chi2
           FROM q),
    z AS (SELECT bd.*, mh.psi,
                 (POWER(chi2 / (k - 1), 1.0 / 3)
                  - (1 - 2.0 / (9 * (k - 1))))
                 / SQRT(2.0 / (9 * (k - 1))) AS zs
          FROM bd, mh)
    SELECT CAST(k AS BIGINT) AS n_strata,
           FLOOR(psi * 1e4 + 0.5) / 1e4 AS or_mh,
           FLOOR(chi2 * 1e4 + 0.5) / 1e4 AS bd_chi2,
           CAST(k - 1 AS BIGINT) AS dof,
           FLOOR({normal_sf_sql("GREATEST(zs, -8.0)")} * 1e6 + 0.5)
             / 1e6 AS p_value
    FROM z
    """,
)
def stat_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day homogeneity test over the weekday strata of the
    urgent-priority x fulfilled-status tables: under the MH pooled
    OR, each stratum's expected exposed-case count solves the
    ancillary quadratic, and chi2 = sum (a - a~)^2 / Var(a~) with
    strata-1 df (Wilson-Hilferty tail). Non-significant = quoting
    stat_mantel_haenszel's single OR is legitimate; significant =
    the association CHANGES by stratum and a pooled number would
    bury the story. The license check for every stratified readout.

    Scale: one rollup to the weekday-bounded 2x2 frame; everything
    after is closed-form algebra on 7 rows."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("stratum"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("e"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    s = d.groupBy("stratum").agg(
        F.sum(F.col("e") * F.col("y")).cast("double").alias("a"),
        F.sum(F.col("e") * (1 - F.col("y"))).cast("double").alias("b"),
        F.sum((1 - F.col("e")) * F.col("y")).cast("double").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("y"))).cast("double").alias("dd"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).localCheckpoint()  # weekday-bounded
    mh = s.agg(
        (
            F.sum(F.col("a") * F.col("dd") / F.col("n"))
            / F.sum(F.col("b") * F.col("c") / F.col("n"))
        ).alias("psi")
    )
    q0 = s.crossJoin(F.broadcast(mh))
    m1 = F.col("a") + F.col("b")
    k1 = F.col("a") + F.col("c")
    bq = F.col("psi") * (m1 + k1) + (F.col("n") - m1 - k1)
    at = F.when(
        F.abs(F.col("psi") - 1) < 1e-12, m1 * k1 / F.col("n")
    ).otherwise(
        (bq - F.sqrt(bq * bq - 4 * (F.col("psi") - 1) * F.col("psi") * m1 * k1))
        / (2 * (F.col("psi") - 1))
    )
    q = q0.select(
        "a", "n", m1.alias("m1"), k1.alias("k1"), "psi", at.alias("at")
    )
    var_inv = (
        1 / F.col("at")
        + 1 / (F.col("m1") - F.col("at"))
        + 1 / (F.col("k1") - F.col("at"))
        + 1 / (F.col("n") - F.col("m1") - F.col("k1") + F.col("at"))
    )
    bd = q.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(
            (F.col("a") - F.col("at")) * (F.col("a") - F.col("at")) * var_inv
        ).alias("chi2"),
        F.first("psi").alias("psi"),
    )
    km1 = F.col("k") - 1
    zs = (
        F.pow(F.col("chi2") / km1, 1.0 / 3) - (1 - 2.0 / (9 * km1))
    ) / F.sqrt(2.0 / (9 * km1))
    return bd.select(
        F.col("k").cast("bigint").alias("n_strata"),
        rnd(F.col("psi"), 4).alias("or_mh"),
        rnd(F.col("chi2"), 4).alias("bd_chi2"),
        km1.cast("bigint").alias("dof"),
        rnd(normal_sf(F.greatest(zs, F.lit(-8.0))), 6).alias("p_value"),
    )


@query(
    "stat_geometric_median",
    # Real oracle: the day points are integer counts, the Weiszfeld
    # recursion carries (mx, my) with identical guard/update
    # arithmetic for the fixed round count, and all outputs round on
    # the grid.
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS DOUBLE) AS y
      FROM events GROUP BY 1),
    m0 AS (SELECT AVG(x) AS mx, AVG(y) AS my FROM d),
    wz AS (
      SELECT 0 AS it, m0.mx, m0.my FROM m0
      UNION ALL
      SELECT it + 1,
             (SELECT SUM(d.x / GREATEST(SQRT((d.x - wz.mx)
                     * (d.x - wz.mx) + (d.y - wz.my)
                     * (d.y - wz.my)), 1e-9)) FROM d)
             / (SELECT SUM(1 / GREATEST(SQRT((d.x - wz.mx)
                       * (d.x - wz.mx) + (d.y - wz.my)
                       * (d.y - wz.my)), 1e-9)) FROM d),
             (SELECT SUM(d.y / GREATEST(SQRT((d.x - wz.mx)
                     * (d.x - wz.mx) + (d.y - wz.my)
                     * (d.y - wz.my)), 1e-9)) FROM d)
             / (SELECT SUM(1 / GREATEST(SQRT((d.x - wz.mx)
                       * (d.x - wz.mx) + (d.y - wz.my)
                       * (d.y - wz.my)), 1e-9)) FROM d)
      FROM wz WHERE it < {GM_ITERS}),
    fin AS (SELECT mx, my FROM wz WHERE it = {GM_ITERS})
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
           FLOOR(fin.mx * 1e4 + 0.5) / 1e4 AS gm_events,
           FLOOR(fin.my * 1e4 + 0.5) / 1e4 AS gm_purchases,
           FLOOR(m0.mx * 1e4 + 0.5) / 1e4 AS mean_events,
           FLOOR(m0.my * 1e4 + 0.5) / 1e4 AS mean_purchases,
           FLOOR(SQRT((fin.mx - m0.mx) * (fin.mx - m0.mx)
                      + (fin.my - m0.my) * (fin.my - m0.my))
                 * 1e4 + 0.5) / 1e4 AS outlier_displacement
    FROM fin, m0
    """,
)
def stat_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weiszfeld geometric median of the daily (total events,
    purchase events) cloud, reported beside the component mean: the
    L1 multivariate center has a 50% breakdown point, so a handful
    of incident days cannot drag it the way they drag the mean —
    and outlier_displacement = ||mean - gm|| is the one-number
    reading of HOW MUCH the mean is being dragged (stat_mad's role,
    two dimensions up). {it} fixed Weiszfeld rounds from the mean,
    distances guarded at 1e-9.

    Scale: one day-grain pass; the iteration is two sums per round
    over the calendar-bounded frame, replayed exactly by the
    oracle's state-carrying recursion."""
    rows = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.sum("p").cast("double").alias("y"),
        )
        .collect()  # calendar-bounded day cloud (documented carry)
    )
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    n = len(xs)
    mx0 = sum(xs) / n
    my0 = sum(ys) / n
    mx, my = mx0, my0
    for _ in range(GM_ITERS):
        num_x = num_y = den = 0.0
        for x, y in zip(xs, ys):
            dist = max(math.sqrt((x - mx) ** 2 + (y - my) ** 2), 1e-9)
            num_x += x / dist
            num_y += y / dist
            den += 1 / dist
        mx, my = num_x / den, num_y / den
    g4 = lambda v: math.floor(v * 1e4 + 0.5) / 1e4  # noqa: E731
    disp = math.sqrt((mx - mx0) ** 2 + (my - my0) ** 2)
    return (
        cat(spark, sf_dir)["events"]
        .sparkSession.createDataFrame(
            [(n, g4(mx), g4(my), g4(mx0), g4(my0), g4(disp))],
            "n_days long, gm_events double, gm_purchases double, "
            "mean_events double, mean_purchases double, "
            "outlier_displacement double",
        )
    )


stat_geometric_median.__doc__ = stat_geometric_median.__doc__.format(
    it=GM_ITERS
)
