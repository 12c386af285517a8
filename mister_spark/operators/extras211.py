"""Wave 211: ordered-alternative trend testing and rank changepoints.

stat_jonckheere_terpstra is the Jonckheere-Terpstra test across the
five order-priority classes: does order value trend MONOTONICALLY as
priority relaxes from 1-URGENT to 5-LOW? stat_kruskal_wallis asks "do
the groups differ at all" and spends power on every permutation of
group means; JT bets the alternative is ordered — the one-sided
question a business actually asks ("do lower priorities run larger?")
— and buys roughly a doubling of power when the ordering is real.
ev_pettitt_test is Pettitt's rank-based single changepoint on daily
event volume: the Mann-Whitney statistic swept over every split
point, with the closed-form tail 2*exp(-6K^2/(n^3+n^2)). Unlike
ev_cusum_detect (mean shifts in KNOWN units) or ev_changepoint_binseg
(variance-cost splits), Pettitt is distribution-free: it flags the
level shift without assuming the series' scale or shape.

Exactness: JT runs on a grid-collapsed value axis (floor(total/1000))
so pair counts, tie sizes and the tie-corrected variance terms are
all exact integers; Pettitt's V_t/U_t are integer sign sums; both
tails are shared closed forms evaluated on identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

JT_BUCKET = 1000  # totalprice grid step: cell counts stay integers
EPOCH = "1970-01-01"


@query(
    "stat_jonckheere_terpstra",
    # Real oracle: cell counts, pairwise U (doubled to stay integer),
    # group sizes and tie sizes are exact integers on the shared
    # floor(total/1000) grid; mean, the three tie-corrected variance
    # terms and z evaluate the same closed forms — float only at the
    # final division, inside the rounding grid.
    oracle=f"""
    WITH g AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS grp,
                      CAST(FLOOR(o_totalprice / {JT_BUCKET}) AS BIGINT)
                        AS v,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM orders GROUP BY 1, 2),
    u AS (SELECT SUM(CASE WHEN b.v > a.v THEN 2 * a.c * b.c
                          WHEN b.v = a.v THEN a.c * b.c
                          ELSE 0 END) AS jt2
          FROM g a JOIN g b ON b.grp > a.grp),
    gi AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS ni FROM g GROUP BY 1),
    tv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM g GROUP BY 1),
    n AS (SELECT CAST(SUM(ni) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 SUM(ni * ni) AS sni2,
                 SUM(ni * (ni - 1) * (2 * ni + 5)) AS a_g,
                 SUM(ni * (ni - 1) * (ni - 2)) AS b_g,
                 SUM(ni * (ni - 1)) AS c_g
          FROM gi),
    t AS (SELECT SUM(t * (t - 1) * (2 * t + 5)) AS a_t,
                 SUM(t * (t - 1) * (t - 2)) AS b_t,
                 SUM(t * (t - 1)) AS c_t
          FROM tv),
    s AS (SELECT n.*, t.*, u.jt2,
                 (CAST(n.n AS DOUBLE) * n.n - n.sni2) / 2 AS mean2,
                 (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
                  - n.a_g - t.a_t) / 72.0
                 + CAST(n.b_g AS DOUBLE) * t.b_t
                   / (36.0 * n.n * (n.n - 1) * (n.n - 2))
                 + CAST(n.c_g AS DOUBLE) * t.c_t
                   / (8.0 * n.n * (n.n - 1)) AS var_jt
          FROM n, t, u),
    z AS (SELECT s.*,
                 CASE WHEN var_jt <= 0 THEN 0.0
                      ELSE (jt2 - mean2) / (2 * SQRT(var_jt)) END AS zs
          FROM s)
    SELECT n AS n_orders, k AS n_groups,
           jt2 / 2.0 AS jt_stat,
           mean2 / 2.0 AS mean_jt,
           FLOOR(zs * 1e4 + 0.5) / 1e4 AS z,
           FLOOR(2 * {normal_sf_sql("ABS(zs)")} * 1e6 + 0.5) / 1e6
             AS p_value
    FROM z
    """,
)
def stat_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test: order-priority
    classes 1..5 as the ordered groups, order totalprice (grid-
    collapsed to $1k cells) as the response. JT = sum over ordered
    group pairs of the Mann-Whitney U (ties credited 1/2, carried
    doubled so every count stays an integer); the null mean and the
    Hollander-Wolfe tie-corrected variance come from group sizes and
    cross-group tie sizes alone. |z| large means value moves
    MONOTONICALLY with priority — the ordered question KW's omnibus
    chi-square dilutes across all k! orderings.

    Scale: ONE grid-collapse aggregation (5 groups x ~bounded $1k
    cells regardless of row count), then a broadcast cell-pair join
    on the model-sized grid and 1-row closed-form algebra. The O(n^2)
    pair space of the textbook definition never materializes."""
    g = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("grp"),
            F.floor(F.col("o_totalprice") / JT_BUCKET)
            .cast("bigint")
            .alias("v"),
        )
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # bounded grid; feeds pairs + sizes + ties
    )
    b = g.select(
        F.col("grp").alias("grp2"), F.col("v").alias("v2"),
        F.col("c").alias("c2"),
    )
    jt2 = (
        g.join(F.broadcast(b), F.col("grp2") > F.col("grp"))
        .agg(
            F.sum(
                F.when(F.col("v2") > F.col("v"), 2 * F.col("c") * F.col("c2"))
                .when(F.col("v2") == F.col("v"), F.col("c") * F.col("c2"))
                .otherwise(0)
            ).alias("jt2")
        )
    )
    gi = g.groupBy("grp").agg(F.sum("c").alias("ni"))
    n = gi.agg(
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("ni") * F.col("ni")).alias("sni2"),
        F.sum(F.col("ni") * (F.col("ni") - 1) * (2 * F.col("ni") + 5)).alias(
            "a_g"
        ),
        F.sum(F.col("ni") * (F.col("ni") - 1) * (F.col("ni") - 2)).alias(
            "b_g"
        ),
        F.sum(F.col("ni") * (F.col("ni") - 1)).alias("c_g"),
    )
    tv = g.groupBy("v").agg(F.sum("c").alias("t"))
    t = tv.agg(
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias(
            "a_t"
        ),
        F.sum(F.col("t") * (F.col("t") - 1) * (F.col("t") - 2)).alias("b_t"),
        F.sum(F.col("t") * (F.col("t") - 1)).alias("c_t"),
    )
    nn = F.col("n").cast("double")
    mean2 = (nn * F.col("n") - F.col("sni2")) / 2
    var_jt = (
        (nn * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("a_g")
         - F.col("a_t")) / 72.0
        + F.col("b_g").cast("double") * F.col("b_t")
        / (36.0 * nn * (F.col("n") - 1) * (F.col("n") - 2))
        + F.col("c_g").cast("double") * F.col("c_t")
        / (8.0 * nn * (F.col("n") - 1))
    )
    s = (
        n.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(jt2))
        .select(
            "n", "k", "jt2",
            mean2.alias("mean2"),
            var_jt.alias("var_jt"),
        )
    )
    zs = F.when(F.col("var_jt") <= 0, F.lit(0.0)).otherwise(
        (F.col("jt2") - F.col("mean2")) / (2 * F.sqrt(F.col("var_jt")))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("k").cast("bigint").alias("n_groups"),
        (F.col("jt2") / 2.0).alias("jt_stat"),
        (F.col("mean2") / 2.0).alias("mean_jt"),
        rnd(zs, 4).alias("z"),
        rnd(2 * normal_sf(F.abs(zs)), 6).alias("p_value"),
    )


@query(
    "ev_pettitt_test",
    # Real oracle: V_t is an integer sign sum over the calendar-
    # bounded day-pair frame, U_t its exact running sum; K and the
    # argmax day are integer comparisons with a smallest-day
    # tie-break, and the 2*exp(-6K^2/(n^3+n^2)) tail plus the two
    # segment means divide identical operands.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    v AS (SELECT a.t, CAST(SUM(CASE WHEN a.y > b.y THEN 1
                                    WHEN a.y < b.y THEN -1
                                    ELSE 0 END) AS BIGINT) AS vt
          FROM d a JOIN d b ON TRUE GROUP BY 1),
    u AS (SELECT t, SUM(vt) OVER (ORDER BY t) AS ut FROM v),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    k AS (SELECT t AS t_star, ABS(ut) AS kk FROM u
          ORDER BY ABS(ut) DESC, t LIMIT 1),
    m AS (SELECT (SELECT AVG(CAST(y AS DOUBLE)) FROM d
                  WHERE t <= (SELECT t_star FROM k)) AS mb,
                 (SELECT AVG(CAST(y AS DOUBLE)) FROM d
                  WHERE t > (SELECT t_star FROM k)) AS ma)
    SELECT n.n AS n_days,
           CAST(k.kk AS BIGINT) AS k_stat,
           strftime(DATE '{EPOCH}' + CAST(k.t_star AS INT), '%Y-%m-%d')
             AS change_date,
           FLOOR(LEAST(1.0, 2 * EXP(-6.0 * k.kk * k.kk /
                 (CAST(n.n AS DOUBLE) * n.n * n.n
                  + CAST(n.n AS DOUBLE) * n.n))) * 1e6 + 0.5) / 1e6
             AS p_value,
           FLOOR(m.mb * 1e4 + 0.5) / 1e4 AS mean_before,
           FLOOR(COALESCE(m.ma, m.mb) * 1e4 + 0.5) / 1e4 AS mean_after
    FROM n, k, m
    """,
)
def ev_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric changepoint on daily event volume:
    U_t = sum of pairwise rank signs across each candidate split,
    computed as the running sum of per-day sign totals V_t; K =
    max|U_t| locates the most likely level shift (earliest day on
    ties) and 2*exp(-6K^2/(n^3+n^2)) is Pettitt's exact-asymptotic
    tail. Distribution-free: no variance to estimate, no unit to
    tune — the complement to ev_cusum_detect (needs a scale) and
    ev_changepoint_binseg (assumes squared-error costs). Reports the
    split date and the mean level on each side.

    Scale: ONE day-grain count collapses everything downstream to
    the calendar-bounded frame; the day-pair sign join and the
    running-sum window are O(days^2) / O(days) on that model-sized
    series regardless of event count."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # calendar-bounded; feeds pairs, means, n
    )
    b = d.select(F.col("y").alias("yb"))
    v = (
        d.join(F.broadcast(b))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("y") > F.col("yb"), 1)
                .when(F.col("y") < F.col("yb"), -1)
                .otherwise(0)
            ).alias("vt")
        )
    )
    # unpartitioned window: runs on the calendar-bounded day frame
    # (the documented model-sized carry of the two-phase pattern)
    u = v.select("t", F.sum("vt").over(W.orderBy("t")).alias("ut"))
    k = (
        u.orderBy(F.abs(F.col("ut")).desc(), "t")
        .limit(1)
        .select(F.col("t").alias("t_star"), F.abs(F.col("ut")).alias("kk"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    m = (
        d.crossJoin(F.broadcast(k))
        .agg(
            F.avg(
                F.when(F.col("t") <= F.col("t_star"), F.col("y").cast("double"))
            ).alias("mb"),
            F.avg(
                F.when(F.col("t") > F.col("t_star"), F.col("y").cast("double"))
            ).alias("ma"),
        )
    )
    nn = F.col("n").cast("double")
    p = F.least(
        F.lit(1.0),
        2 * F.exp(-6.0 * F.col("kk") * F.col("kk") / (nn * F.col("n") * F.col("n") + nn * F.col("n"))),
    )
    return (
        n.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(m))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("kk").cast("bigint").alias("k_stat"),
            F.date_format(
                F.date_add(
                    F.lit(EPOCH).cast("date"), F.col("t_star").cast("int")
                ),
                "yyyy-MM-dd",
            ).alias("change_date"),
            rnd(p, 6).alias("p_value"),
            rnd(F.col("mb"), 4).alias("mean_before"),
            rnd(F.coalesce(F.col("ma"), F.col("mb")), 4).alias("mean_after"),
        )
    )
