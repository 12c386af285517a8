"""Wave 197: level stationarity and asymmetric ordinal association.

stat_kpss is the KPSS test on daily event volume — the COMPLEMENT of
stat_adf: ADF's null is a unit root (reject = mean-reverting), KPSS's
null is level stationarity (reject = drifting). Running both is the
standard identification protocol: agree-stationary, agree-drifting, or
the uncomfortable "not enough data" quadrant. stat_somers_d is the
asymmetric cousin of Kendall's tau — when one variable is the
predictor and one the response (here: does basket size predict order
priority?), tau-b's symmetric denominator is wrong and Somers'
D(y|x) — which discounts only response ties — is the number to quote.

Both are integer-exact until the final divisions: KPSS runs on the
scaled residuals u_t = n*y_t - sum(y) (BIGINT, so the partial-sum
cumulation is order-invariant), Somers' D on pure pair counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
KPSS_MAX_LAG = 24
# KPSS 5% critical value for the level-stationarity statistic (eta_mu)
KPSS_CRIT_5PCT = 0.463


@query(
    "stat_kpss",
    # Real oracle: day counts are integers, so the scaled residuals
    # u_t = n*y_t - sum(y) are exact BIGINTs; their running sum (the
    # KPSS partial-sum process, scaled by n) is an integer cumsum —
    # order-invariant, so Spark's bucketed two-phase prefix sum and
    # DuckDB's sequential window produce the SAME integers. The
    # Bartlett lag L obeys the integer rule 100*L^4 <= 256*n
    # (equivalent to floor(4*(n/100)^(1/4)) without touching libm),
    # and only the final eta/lrv divisions are float, inside the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy FROM d),
    e AS (SELECT d.t, m.n * d.y - m.sy AS u FROM d, m),
    cum AS (SELECT t, SUM(u) OVER (ORDER BY t) AS c FROM e),
    sc AS (SELECT SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS sc2
           FROM cum),
    lsel AS (SELECT MAX(ls.l) AS lag_l
             FROM (SELECT unnest(range(0, {KPSS_MAX_LAG + 1})) AS l) ls, m
             WHERE 100 * ls.l * ls.l * ls.l * ls.l <= 256 * m.n),
    g0 AS (SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)) AS g0 FROM e),
    gam AS (SELECT s.j, SUM(CAST(a.u AS DOUBLE) * CAST(b.u AS DOUBLE)) AS gj
            FROM e a,
                 (SELECT unnest(range(1, {KPSS_MAX_LAG + 1})) AS j) s,
                 e b
            WHERE b.t = a.t - s.j
            GROUP BY 1),
    wg AS (SELECT COALESCE(SUM((1.0 - CAST(g.j AS DOUBLE)
                                      / (lsel.lag_l + 1)) * g.gj), 0.0)
                    AS wsum
           FROM gam g, lsel WHERE g.j <= lsel.lag_l),
    fin AS (SELECT m.n AS n, lsel.lag_l AS lag_l,
                   g0.g0 / (CAST(m.n AS DOUBLE) * m.n * m.n) AS gamma0,
                   (g0.g0 + 2.0 * wg.wsum)
                     / (CAST(m.n AS DOUBLE) * m.n * m.n) AS lrv,
                   CASE WHEN g0.g0 + 2.0 * wg.wsum > 0
                        THEN sc.sc2 / (CAST(m.n AS DOUBLE)
                                       * (g0.g0 + 2.0 * wg.wsum))
                        ELSE 0.0 END AS stat
            FROM m, lsel, g0, wg, sc)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(lag_l AS BIGINT) AS bartlett_lags,
           FLOOR(gamma0 * 1e4 + 0.5) / 1e4 AS gamma0,
           FLOOR(lrv * 1e4 + 0.5) / 1e4 AS long_run_var,
           FLOOR(stat * 1e6 + 0.5) / 1e6 AS kpss_stat,
           CASE WHEN FLOOR(stat * 1e6 + 0.5) / 1e6 > {KPSS_CRIT_5PCT}
                THEN 1 ELSE 0 END AS stationarity_rejected
    FROM fin
    """,
)
def stat_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on daily event counts: demean the
    series, cumulate the residuals, and compare the scaled energy of
    that partial-sum bridge against the Bartlett-weighted long-run
    variance (lags from the Schwert rule floor(4*(n/100)^(1/4)),
    computed by the exact integer inequality 100*L^4 <= 256*n). A
    stationary series keeps the bridge near zero; a drifting one lets
    it wander, and eta blows past the 0.463 critical value. Paired
    with stat_adf this closes the identification loop: ADF rejects
    unit roots, KPSS rejects stationarity — the two nulls face
    opposite directions.

    Scale: ONE day-grain count collapses events to the calendar-
    bounded frame; the partial-sum process is the two-phase
    bucketed_cumsum over exact BIGINT scaled residuals (no single-task
    window, and integer addition makes the cumsum order-invariant —
    bit-identical to the oracle's sequential window); autocovariances
    are one lag-key equi-join (lag frame x day frame), never a range
    join. Everything after the day collapse is model-sized."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    ).localCheckpoint()  # 1 row; feeds e, lsel, fin
    e = (
        d.crossJoin(F.broadcast(m))
        .select("t", (F.col("n") * F.col("y") - F.col("sy")).alias("u"))
        .localCheckpoint()  # feeds cumsum, gamma0, and both lag aliases
    )
    cum = bucketed_cumsum(e, "t", {"c": F.col("u")})
    sc = cum.agg(
        F.sum(F.col("c").cast("double") * F.col("c").cast("double")).alias(
            "sc2"
        )
    )
    lags = spark.range(0, KPSS_MAX_LAG + 1).select(F.col("id").alias("l"))
    lsel = (
        m.crossJoin(F.broadcast(lags))
        .filter(
            100 * F.col("l") * F.col("l") * F.col("l") * F.col("l")
            <= 256 * F.col("n")
        )
        .agg(F.max("l").alias("lag_l"))
    )
    g0 = e.agg(
        F.sum(F.col("u").cast("double") * F.col("u").cast("double")).alias(
            "g0"
        )
    )
    jf = spark.range(1, KPSS_MAX_LAG + 1).select(F.col("id").alias("j"))
    shifted = (
        e.crossJoin(F.broadcast(jf))
        .select((F.col("t") + F.col("j")).alias("t"), "j",
                F.col("u").alias("ub"))
    )
    gam = (
        e.join(shifted, "t")
        .groupBy("j")
        .agg(
            F.sum(
                F.col("u").cast("double") * F.col("ub").cast("double")
            ).alias("gj")
        )
    )
    wg = (
        gam.crossJoin(F.broadcast(lsel))
        .filter(F.col("j") <= F.col("lag_l"))
        .agg(
            F.coalesce(
                F.sum(
                    (
                        1.0
                        - F.col("j").cast("double") / (F.col("lag_l") + 1)
                    )
                    * F.col("gj")
                ),
                F.lit(0.0),
            ).alias("wsum")
        )
    )
    n3 = F.col("n").cast("double") * F.col("n") * F.col("n")
    lrv_scaled = F.col("g0") + 2.0 * F.col("wsum")
    stat = F.when(
        lrv_scaled > 0,
        F.col("sc2") / (F.col("n").cast("double") * lrv_scaled),
    ).otherwise(0.0)
    fin = (
        m.crossJoin(F.broadcast(lsel))
        .crossJoin(F.broadcast(g0))
        .crossJoin(F.broadcast(wg))
        .crossJoin(F.broadcast(sc))
    )
    return fin.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("lag_l").cast("bigint").alias("bartlett_lags"),
        rnd(F.col("g0") / n3, 4).alias("gamma0"),
        rnd(lrv_scaled / n3, 4).alias("long_run_var"),
        rnd(stat, 6).alias("kpss_stat"),
        F.when(rnd(stat, 6) > KPSS_CRIT_5PCT, 1)
        .otherwise(0)
        .alias("stationarity_rejected"),
    )


@query(
    "stat_somers_d",
    # Real oracle: the (basket-size x priority-rank) cell grid holds
    # integer counts; concordant/discordant/tied pair totals are
    # integer cell-product sums over the ordered grid self-join, so
    # both engines divide identical BIGINTs — only the three final
    # ratios are float, inside the 1e-6 grid.
    oracle="""
    WITH li AS (SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS x
                FROM lineitem GROUP BY 1),
    g AS (SELECT li.x,
                 CAST(substr(o.o_orderpriority, 1, 1) AS INT) AS y,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM orders o JOIN li ON li.ok = o.o_orderkey
          GROUP BY 1, 2),
    p AS (SELECT
            SUM(CASE WHEN a.x < b.x AND a.y < b.y
                     THEN a.c * b.c ELSE 0 END) AS conc,
            SUM(CASE WHEN a.x < b.x AND a.y > b.y
                     THEN a.c * b.c ELSE 0 END) AS disc,
            SUM(CASE WHEN a.x = b.x
                     THEN a.c * b.c ELSE 0 END) AS tx,
            SUM(CASE WHEN a.x < b.x AND a.y = b.y
                     THEN a.c * b.c ELSE 0 END) AS ty
          FROM g a JOIN g b
            ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)),
    n AS (SELECT SUM(c) AS nr FROM g)
    SELECT CAST(n.nr AS BIGINT) AS n_rows,
           CAST(p.conc AS BIGINT) AS concordant,
           CAST(p.disc AS BIGINT) AS discordant,
           CAST(p.tx AS BIGINT) AS tied_x_pairs,
           CAST(p.ty AS BIGINT) AS tied_y_pairs,
           FLOOR(CAST(p.conc - p.disc AS DOUBLE)
                 / NULLIF(p.conc + p.disc + p.ty, 0) * 1e6 + 0.5) / 1e6
             AS d_yx,
           FLOOR(CAST(p.conc - p.disc AS DOUBLE)
                 / NULLIF(p.conc + p.disc + p.tx, 0)
                 * 1e6 + 0.5) / 1e6 AS d_xy,
           FLOOR(CAST(p.conc - p.disc AS DOUBLE)
                 / NULLIF(SQRT(CAST(p.conc + p.disc + p.ty AS DOUBLE)
                               * (p.conc + p.disc + p.tx)),
                          0) * 1e6 + 0.5) / 1e6 AS tau_b
    FROM n, p
    """,
)
def stat_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D between basket size (lineitems per order, the
    predictor x) and order priority rank (1-URGENT..5-LOW, the
    response y). D(y|x) = (C - D) / (C + D + T_y) discounts pairs
    tied only on the RESPONSE — the asymmetric correction tau-b
    refuses to make, and the reason D (not tau) is the ranking
    industry's Gini: when x predicts y, a pair tied on y is a miss
    x should be charged for, but a pair tied on x carries no
    information about x's direction. D(x|y) and tau-b (their
    geometric-mean compromise) come from the same three pair sums.

    Scale: two hash aggregations collapse the fact tables to the
    (basket-size x priority) cell grid — bounded by the value domain,
    not the row count; the ordered grid self-join compares cells
    (≤ dozens), never rows, and every pair total is an exact integer
    cell-product sum. The 100 TB cost is the groupBys, both
    map-side-combinable."""
    li = (
        cat(spark, sf_dir)["lineitem"]
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    orders = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("y"),
    )
    g = (
        orders.join(li, "ok")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # cell grid; feeds both join aliases + totals
    )
    a = g.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = g.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("xa") < F.col("xb"))
        | ((F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb"))),
    )
    cc = F.col("ca") * F.col("cb")
    p = pairs.agg(
        F.sum(
            F.when((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")), cc)
            .otherwise(F.lit(0))
        ).alias("conc"),
        F.sum(
            F.when((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")), cc)
            .otherwise(F.lit(0))
        ).alias("disc"),
        F.sum(
            F.when(F.col("xa") == F.col("xb"), cc).otherwise(F.lit(0))
        ).alias("tx"),
        F.sum(
            F.when((F.col("xa") < F.col("xb")) & (F.col("ya") == F.col("yb")), cc)
            .otherwise(F.lit(0))
        ).alias("ty"),
    )
    n = g.agg(F.sum("c").alias("nr"))
    fin = n.crossJoin(F.broadcast(p))
    num = (F.col("conc") - F.col("disc")).cast("double")
    den_yx = F.nullif(
        (F.col("conc") + F.col("disc") + F.col("ty")).cast("double"), F.lit(0.0)
    )
    den_xy = F.nullif(
        (F.col("conc") + F.col("disc") + F.col("tx")).cast("double"),
        F.lit(0.0),
    )
    return fin.select(
        F.col("nr").cast("bigint").alias("n_rows"),
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.col("tx").cast("bigint").alias("tied_x_pairs"),
        F.col("ty").cast("bigint").alias("tied_y_pairs"),
        rnd(num / den_yx, 6).alias("d_yx"),
        rnd(num / den_xy, 6).alias("d_xy"),
        rnd(num / F.nullif(F.sqrt(den_yx * den_xy), F.lit(0.0)), 6).alias(
            "tau_b"
        ),
    )
