"""Wave 220: space-time cluster scanning and AR(1)-corrected trends.

stat_kulldorff_scan is the Kulldorff space-time scan statistic over
the (customer nation) x (order month) grid: every nation x
contiguous-month window (length <= 6) is scored with the Poisson
log-likelihood ratio against the marginal-expected baseline, and the
maximum names WHERE and WHEN orders clustered beyond what that
nation's overall share and that season's overall pulse explain —
the disease-outbreak detector pointed at commerce.
stat_anomaly-style pipelines flag single cells; the scan finds the
coherent region. stat_cochrane_orcutt is the companion to wave
219's Newey-West: where NW corrects the standard error, CO corrects
the FIT — estimate the residual AR(1) coefficient rho, quasi-
difference both sides, and refit, reporting the slope/se before and
after plus the Durbin-Watson of the transformed residuals as the
proof the correction took.

Exactness: scan counts are integers and expectations rationals of
integers (the LLR is ln-arithmetic on identical operands, argmax on
the rounded grid with full tiebreaks); CO is two closed-form OLS
passes plus one LAG ratio on the day frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
SCAN_MAX_LEN = 6  # longest month window scanned


@query(
    "stat_kulldorff_scan",
    # Real oracle: cell counts, window sums and both marginals are
    # integers; expectations are integer ratios, the Poisson LLR is
    # the same ln closed form, and the top cluster is an argmax on
    # the 1e-4-rounded LLR with (nation, start, end) tiebreaks.
    oracle=f"""
    WITH cells AS (SELECT c.c_nationkey AS z,
                          CAST(date_part('year', CAST(o.o_orderdate
                            AS DATE)) * 12 + date_part('month',
                            CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT)
                            AS m,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM orders o JOIN customer c
                        ON o.o_custkey = c.c_custkey
                   GROUP BY 1, 2),
    nz AS (SELECT z, CAST(SUM(c) AS BIGINT) AS cz FROM cells GROUP BY 1),
    nm AS (SELECT m, CAST(SUM(c) AS BIGINT) AS cm FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    months AS (SELECT DISTINCT m FROM cells),
    win AS (SELECT a.m AS m1, b.m AS m2
            FROM months a JOIN months b
                 ON b.m >= a.m AND b.m < a.m + {SCAN_MAX_LEN}),
    sc AS (SELECT nz.z, w.m1, w.m2,
                  CAST(COALESCE(SUM(cells.c), 0) AS BIGINT) AS c,
                  nz.cz * CAST((SELECT SUM(nm.cm) FROM nm
                                WHERE nm.m BETWEEN w.m1 AND w.m2)
                               AS DOUBLE) / tot.n AS e,
                  tot.n AS n
           FROM nz CROSS JOIN win w CROSS JOIN tot
           LEFT JOIN cells ON cells.z = nz.z
                          AND cells.m BETWEEN w.m1 AND w.m2
           GROUP BY nz.z, w.m1, w.m2, nz.cz, tot.n),
    llr AS (SELECT z, m1, m2, c, e,
                   CASE WHEN c > e AND c > 0 AND c < n THEN
                        c * LN(c / e)
                        + (n - c) * LN((n - c) / (n - e))
                   ELSE 0.0 END AS llr
            FROM sc),
    top AS (SELECT * FROM llr
            ORDER BY FLOOR(llr * 1e4 + 0.5) DESC, z, m1, m2 LIMIT 1)
    SELECT (SELECT n FROM tot) AS n_orders,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM llr) AS n_windows,
           nat.n_name AS cluster_nation,
           strftime(make_date(CAST(top.m1 // 12 AS INT),
                    CAST(top.m1 % 12 + 1 AS INT), 1), '%Y-%m')
             AS cluster_start,
           strftime(make_date(CAST(top.m2 // 12 AS INT),
                    CAST(top.m2 % 12 + 1 AS INT), 1), '%Y-%m')
             AS cluster_end,
           top.c AS cluster_orders,
           FLOOR(top.e * 1e4 + 0.5) / 1e4 AS expected_orders,
           FLOOR(top.llr * 1e4 + 0.5) / 1e4 AS llr
    FROM top JOIN nation nat ON nat.n_nationkey = top.z
    """,
)
def stat_kulldorff_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kulldorff space-time scan on orders: cells are (customer
    nation, order month); each nation x contiguous-month window (<=
    {ml} months) is scored with the Poisson LLR
    c ln(c/e) + (N-c) ln((N-c)/(N-e)) against the expectation from
    the nation and month marginals, and the max-LLR window is the
    cluster — the place-and-period where demand ran hottest beyond
    what that nation's size and that season's pulse both explain.
    Per-cell anomaly flags can't see a 4-month regional run; the
    scan is built for exactly that shape.

    Scale: ONE fact aggregation to the nation x month grid
    (dimension x calendar bounded); the window scan is a bounded
    grid self-join (|months| x {ml} windows x |nations|), nowhere
    near the fact table."""
    cells = (
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
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            )
            .cast("bigint")
            .alias("m"),
        )
        .groupBy("z", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # bounded grid; feeds marginals + scan
    )
    nz = cells.groupBy("z").agg(F.sum("c").alias("cz"))
    nm = cells.groupBy("m").agg(F.sum("c").alias("cm"))
    tot = cells.agg(F.sum("c").alias("n"))
    months = cells.select("m").distinct()
    win = (
        months.alias("a")
        .join(
            F.broadcast(months.alias("b")),
            (F.col("b.m") >= F.col("a.m"))
            & (F.col("b.m") < F.col("a.m") + SCAN_MAX_LEN),
        )
        .select(F.col("a.m").alias("m1"), F.col("b.m").alias("m2"))
    )
    wsum = (
        win.join(
            F.broadcast(nm),
            (F.col("m") >= F.col("m1")) & (F.col("m") <= F.col("m2")),
        )
        .groupBy("m1", "m2")
        .agg(F.sum("cm").alias("cw"))
    )
    sc = (
        nz.crossJoin(F.broadcast(wsum))
        .crossJoin(F.broadcast(tot))
        .join(
            cells.select(
                F.col("z").alias("zz"), F.col("m").alias("mm"),
                F.col("c").alias("cc"),
            ),
            (F.col("zz") == F.col("z"))
            & (F.col("mm") >= F.col("m1"))
            & (F.col("mm") <= F.col("m2")),
            "left",
        )
        .groupBy("z", "m1", "m2", "cz", "cw", "n")
        .agg(F.coalesce(F.sum("cc"), F.lit(0)).cast("bigint").alias("c"))
        .select(
            "z", "m1", "m2", "c", "n",
            (
                F.col("cz") * F.col("cw").cast("double") / F.col("n")
            ).alias("e"),
        )
    )
    llr_expr = F.when(
        (F.col("c") > F.col("e")) & (F.col("c") > 0) & (F.col("c") < F.col("n")),
        F.col("c") * F.log(F.col("c") / F.col("e"))
        + (F.col("n") - F.col("c"))
        * F.log((F.col("n") - F.col("c")) / (F.col("n") - F.col("e"))),
    ).otherwise(0.0)
    llr = sc.select(
        "z", "m1", "m2", "c", "e", llr_expr.alias("llr")
    ).localCheckpoint()  # bounded window frame; feeds count + argmax
    nw = llr.agg(F.count(F.lit(1)).alias("n_windows"))
    top = llr.orderBy(
        F.floor(F.col("llr") * 1e4 + 0.5).desc(), "z", "m1", "m2"
    ).limit(1)
    nat = cat(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("z"), "n_name"
    )
    ym = lambda c: F.format_string(  # noqa: E731
        "%04d-%02d", (c / 12).cast("int"), (c % 12 + 1).cast("int")
    )
    return (
        top.join(F.broadcast(nat), "z")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nw))
        .select(
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.col("n_name").alias("cluster_nation"),
            ym(F.col("m1")).alias("cluster_start"),
            ym(F.col("m2")).alias("cluster_end"),
            F.col("c").alias("cluster_orders"),
            rnd(F.col("e"), 4).alias("expected_orders"),
            rnd(F.col("llr"), 4).alias("llr"),
        )
    )


stat_kulldorff_scan.__doc__ = stat_kulldorff_scan.__doc__.format(
    ml=SCAN_MAX_LEN
)


@query(
    "stat_cochrane_orcutt",
    # Real oracle: both OLS passes are closed forms on exact day
    # sums, rho is one LAG product ratio, and the transformed-series
    # refit + Durbin-Watson reuse the identical expressions, all on
    # the rounding grid.
    oracle=f"""
    WITH d0 AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                    AS t, CAST(COUNT(*) AS DOUBLE) AS y
                FROM events GROUP BY 1),
    d AS (SELECT ROW_NUMBER() OVER (ORDER BY t) AS i,
                 CAST(t AS DOUBLE) AS x, y FROM d0),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mx, AVG(y) AS my
          FROM d),
    f1 AS (SELECT m.n,
                  SUM((x - mx) * (y - my)) / SUM((x - mx) * (x - mx)) AS b,
                  my - SUM((x - mx) * (y - my))
                       / SUM((x - mx) * (x - mx)) * mx AS a,
                  SUM((x - mx) * (x - mx)) AS sxx
           FROM d, m GROUP BY m.n, m.mx, m.my),
    r AS (SELECT d.i, d.x, d.y, d.y - f.a - f.b * d.x AS e
          FROM d, f1 f),
    rho AS (SELECT SUM(r.e * p.e) / SUM(p.e * p.e) AS rho
            FROM r JOIN r p ON p.i = r.i - 1),
    q AS (SELECT r.i, r.y - rho.rho * p.y AS ys,
                 r.x - rho.rho * p.x AS xs
          FROM r JOIN r p ON p.i = r.i - 1, rho),
    m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n2, AVG(xs) AS mx2,
                  AVG(ys) AS my2 FROM q),
    f2 AS (SELECT m2.n2,
                  SUM((xs - mx2) * (ys - my2))
                  / SUM((xs - mx2) * (xs - mx2)) AS b2,
                  SUM((xs - mx2) * (xs - mx2)) AS sxx2
           FROM q, m2 GROUP BY m2.n2, m2.mx2, m2.my2),
    r2 AS (SELECT q.i, (q.ys - m2.my2) - f2.b2 * (q.xs - m2.mx2) AS e2
           FROM q, m2, f2),
    dw AS (SELECT SUM((a.e2 - b.e2) * (a.e2 - b.e2))
                  / (SELECT SUM(e2 * e2) FROM r2) AS dw
           FROM r2 a JOIN r2 b ON b.i = a.i - 1),
    se AS (SELECT SQRT((SELECT SUM(e * e) FROM r) / (f1.n - 2)
                       / f1.sxx) AS se1,
                  SQRT((SELECT SUM(e2 * e2) FROM r2) / (f2.n2 - 2)
                       / f2.sxx2) AS se2
           FROM f1, f2)
    SELECT CAST(f1.n AS BIGINT) AS n_days,
           FLOOR(rho.rho * 1e4 + 0.5) / 1e4 AS rho,
           FLOOR(f1.b * 1e4 + 0.5) / 1e4 AS slope_ols,
           FLOOR(f2.b2 * 1e4 + 0.5) / 1e4 AS slope_co,
           FLOOR(se.se1 * 1e6 + 0.5) / 1e6 AS se_ols,
           FLOOR(se.se2 * 1e6 + 0.5) / 1e6 AS se_co,
           FLOOR(dw.dw * 1e4 + 0.5) / 1e4 AS dw_after
    FROM f1, f2, rho, dw, se
    """,
)
def stat_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochrane-Orcutt AR(1) correction of the daily-volume trend:
    fit OLS, estimate rho from lag-1 residual products, quasi-
    difference (y_t - rho y_{t-1} on x_t - rho x_{t-1}), and refit.
    Where stat_newey_west widens the error bars to survive serial
    correlation, CO removes it from the data — slope_co and se_co
    are the efficient estimates when the AR(1) model holds, and
    dw_after (Durbin-Watson of the transformed residuals, ~2 when
    the correction worked) is the built-in receipt.

    Scale: ONE day-grain count; both fits, the rho ratio and the DW
    check are closed-form sums and a LAG self-join on the calendar-
    bounded indexed frame."""
    d0 = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # calendar-bounded day frame
    )
    d = d0.select(
        F.row_number().over(W.orderBy("t")).alias("i"),
        F.col("t").cast("double").alias("x"),
        "y",
    ).localCheckpoint()
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
    )
    dm = d.crossJoin(F.broadcast(m))
    sxy = F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
    sxx = F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
    f1 = dm.groupBy("n", "mx", "my").agg(
        (sxy / sxx).alias("b"), sxx.alias("sxx")
    ).select(
        "n", "sxx", "b", (F.col("my") - F.col("b") * F.col("mx")).alias("a")
    )
    r = (
        d.crossJoin(F.broadcast(f1))
        .select(
            "i", "x", "y",
            (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("e"),
        )
        .localCheckpoint()  # residuals; feed rho + transform + se
    )
    p = r.select(
        (F.col("i") + 1).alias("i"), F.col("x").alias("px"),
        F.col("y").alias("py"), F.col("e").alias("pe"),
    )
    rp = r.join(p, "i")
    rho = rp.agg(
        (
            F.sum(F.col("e") * F.col("pe")) / F.sum(F.col("pe") * F.col("pe"))
        ).alias("rho")
    )
    q = rp.crossJoin(F.broadcast(rho)).select(
        "i",
        (F.col("y") - F.col("rho") * F.col("py")).alias("ys"),
        (F.col("x") - F.col("rho") * F.col("px")).alias("xs"),
    ).localCheckpoint()
    m2 = q.agg(
        F.count(F.lit(1)).cast("double").alias("n2"),
        F.avg("xs").alias("mx2"), F.avg("ys").alias("my2"),
    )
    qm = q.crossJoin(F.broadcast(m2))
    sxy2 = F.sum((F.col("xs") - F.col("mx2")) * (F.col("ys") - F.col("my2")))
    sxx2 = F.sum((F.col("xs") - F.col("mx2")) * (F.col("xs") - F.col("mx2")))
    f2 = qm.groupBy("n2", "mx2", "my2").agg(
        (sxy2 / sxx2).alias("b2"), sxx2.alias("sxx2")
    )
    r2 = (
        q.crossJoin(F.broadcast(f2))
        .select(
            "i",
            (
                (F.col("ys") - F.col("my2"))
                - F.col("b2") * (F.col("xs") - F.col("mx2"))
            ).alias("e2"),
        )
        .localCheckpoint()
    )
    p2 = r2.select((F.col("i") + 1).alias("i"), F.col("e2").alias("pe2"))
    dwn = r2.join(p2, "i").agg(
        F.sum((F.col("e2") - F.col("pe2")) * (F.col("e2") - F.col("pe2"))).alias(
            "num"
        )
    )
    sse1 = r.agg(F.sum(F.col("e") * F.col("e")).alias("see"))
    sse2 = r2.agg(F.sum(F.col("e2") * F.col("e2")).alias("see2"))
    return (
        f1.crossJoin(F.broadcast(f2))
        .crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(dwn))
        .crossJoin(F.broadcast(sse1))
        .crossJoin(F.broadcast(sse2))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            rnd(F.col("rho"), 4).alias("rho"),
            rnd(F.col("b"), 4).alias("slope_ols"),
            rnd(F.col("b2"), 4).alias("slope_co"),
            rnd(
                F.sqrt(F.col("see") / (F.col("n") - 2) / F.col("sxx")), 6
            ).alias("se_ols"),
            rnd(
                F.sqrt(F.col("see2") / (F.col("n2") - 2) / F.col("sxx2")),
                6,
            ).alias("se_co"),
            rnd(F.col("num") / F.col("see2"), 4).alias("dw_after"),
        )
    )
