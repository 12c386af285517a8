"""Wave 258: pairwise lead-lag structure and ordered-group trend.

ev_lead_lag_matrix generalizes ev_cross_correlation's single pair to
the full event-type matrix: for every ordered pair and every lag in
±{w} days it computes the Pearson correlation of the gap-filled daily
count series, keeps each pair's best lag (corr rounded to the 1e-9
grid before the argmax so both engines break ties identically, then
smaller |lag| wins), and labels who LEADS — the causal-screening
matrix a team reads before running stat_granger_causality on the
pairs that light up. stat_cuzick_trend is the nonparametric test for
a TREND across ordered groups (order priorities 1..5 as doses,
price as response): the Wilcoxon-type statistic L = Σ score·rank on
two-phase midranks with the exact tie correction — where
stat_kruskal_wallis asks 'any difference?', Cuzick asks 'does the
response MOVE with the ordering?', which is one degree of freedom and
much more power when the alternative is monotone.

Exactness: daily counts, group scores, and tie counts are integers;
midranks come from collapsed value counts + prefix sums; correlations
and the z statistic divide identical operands; outputs round on the
1e-4/1e-6 grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

LL_MAX_LAG = 7


@query(
    "ev_lead_lag_matrix",
    # Real oracle: identical global day spine, identical lag grid,
    # moment-sum correlations per (pair, lag), argmax on the 1e-9
    # rounded correlation with (|lag|, lag) tie-break.
    oracle=f"""
    WITH daily AS (SELECT event_type,
                          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                          CAST(COUNT(*) AS DOUBLE) AS y
                   FROM events GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    types AS (SELECT DISTINCT event_type AS t FROM daily),
    spine AS (SELECT t.t, b.d0,
                     unnest(generate_series(b.d0, b.d1)) AS day
              FROM types t CROSS JOIN bounds b),
    g AS (SELECT s.t, s.day, COALESCE(d.y, 0.0) AS y
          FROM spine s LEFT JOIN daily d
            ON d.event_type = s.t AND d.day = s.day),
    lags AS (SELECT unnest(generate_series(-{LL_MAX_LAG},
                                           {LL_MAX_LAG})) AS lag),
    joined AS (SELECT a.t AS ta, b.t AS tb, l.lag,
                      a.y AS xa, b.y AS xb
               FROM g a
               CROSS JOIN lags l
               JOIN g b ON b.day = a.day + l.lag
               JOIN types x ON x.t = a.t
               JOIN types yy ON yy.t = b.t
               WHERE a.t < b.t),
    mom AS (SELECT ta, tb, lag, CAST(COUNT(*) AS DOUBLE) AS n,
                   SUM(xa) AS sa, SUM(xb) AS sb,
                   SUM(xa * xa) AS saa, SUM(xb * xb) AS sbb,
                   SUM(xa * xb) AS sab
            FROM joined GROUP BY 1, 2, 3),
    corr AS (SELECT ta, tb, lag,
                    FLOOR(CASE WHEN (saa - sa * sa / n) <= 0
                               OR (sbb - sb * sb / n) <= 0 THEN 0.0
                          ELSE (sab - sa * sb / n)
                               / SQRT((saa - sa * sa / n)
                                      * (sbb - sb * sb / n)) END
                          * 1000000000 + 0.5) / 1000000000 AS r
             FROM mom),
    best AS (SELECT ta, tb, lag, r,
                    ROW_NUMBER() OVER (PARTITION BY ta, tb
                      ORDER BY r DESC, ABS(lag), lag) AS rn
             FROM corr)
    SELECT ta AS type_a, tb AS type_b,
           CAST(lag AS BIGINT) AS best_lag,
           FLOOR(r * 10000 + 0.5) / 10000 AS best_corr,
           CASE WHEN lag > 0 THEN 'a_leads'
                WHEN lag < 0 THEN 'b_leads'
                ELSE 'sync' END AS direction
    FROM best WHERE rn = 1 ORDER BY type_a, type_b
    """,
)
def ev_lead_lag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise lead-lag matrix over the five event types: for every
    pair, the lag in ±{w} days maximizing the daily-count correlation
    (x_a(t) vs x_b(t+lag) on the gap-filled spine; positive best_lag
    means a's today predicts b's future = 'a leads'). The screening
    matrix that says WHERE to point stat_granger_causality — a lag-0
    peak ('sync') is co-movement, an off-zero peak is a lead worth a
    causal test. Correlations hit a 1e-9 grid before the argmax so
    both engines pick identical lags.

    Scale: one daily rollup shuffle; the lag grid rides the
    calendar-bounded (type, day) spine (|types|·days·15 rows), the
    per-(pair, lag) moments are one grouped pass, and the argmax is a
    window over the 10×15-row correlation frame."""
    ev = cat(spark, sf_dir)["events"]
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = daily.select(F.col("event_type").alias("t")).distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select("t", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    g = (
        spine.join(
            daily.withColumnRenamed("event_type", "t"), ["t", "day"], "left"
        )
        .select("t", "day", F.coalesce(F.col("y"), F.lit(0.0)).alias("y"))
        .localCheckpoint()
    )
    lags = spark.createDataFrame(
        [(lag,) for lag in range(-LL_MAX_LAG, LL_MAX_LAG + 1)], "lag long"
    )
    a = g.select(
        F.col("t").alias("ta"), F.col("day").alias("d"), F.col("y").alias("xa")
    )
    b = g.select(
        F.col("t").alias("tb"), F.col("day").alias("db"),
        F.col("y").alias("xb"),
    )
    joined = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("d") + F.col("lag"))
        .filter(F.col("ta") < F.col("tb"))
    )
    mom = joined.groupBy("ta", "tb", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
    )
    va = F.col("saa") - F.col("sa") * F.col("sa") / F.col("n")
    vb = F.col("sbb") - F.col("sb") * F.col("sb") / F.col("n")
    r_raw = F.when((va <= 0) | (vb <= 0), 0.0).otherwise(
        (F.col("sab") - F.col("sa") * F.col("sb") / F.col("n"))
        / F.sqrt(va * vb)
    )
    corr = mom.select(
        "ta",
        "tb",
        "lag",
        (F.floor(r_raw * 1000000000 + F.lit(0.5)) / 1000000000).alias("r"),
    )
    w_best = W.partitionBy("ta", "tb").orderBy(
        F.desc("r"), F.abs(F.col("lag")), F.col("lag")
    )
    return (
        corr.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("lag").cast("bigint").alias("best_lag"),
            ratio(F.col("r")).alias("best_corr"),
            F.when(F.col("lag") > 0, "a_leads")
            .when(F.col("lag") < 0, "b_leads")
            .otherwise("sync")
            .alias("direction"),
        )
        .orderBy("type_a", "type_b")
    )


ev_lead_lag_matrix.__doc__ = ev_lead_lag_matrix.__doc__.format(w=LL_MAX_LAG)


@query(
    "stat_cuzick_trend",
    # Real oracle: identical collapsed (value, group) counts, midranks
    # from prefix sums, L = Σ score·rank, exact moments of the score
    # distribution, and the standard tie-corrected variance.
    oracle=f"""
    WITH v AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS sc,
                      o_totalprice AS x
               FROM orders),
    cnt AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(sc) AS BIGINT) AS ssc
            FROM v GROUP BY 1),
    cum AS (SELECT x, c, ssc,
                   SUM(c) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cc
            FROM cnt),
    mr AS (SELECT x, c, ssc,
                  CAST(cc AS DOUBLE) - (c - 1) / 2.0 AS midrank
           FROM cum),
    s AS (SELECT CAST(SUM(c) AS DOUBLE) AS n,
                 SUM(ssc * midrank) AS l_stat,
                 SUM(ssc) AS sl,
                 SUM(c * CAST(c AS DOUBLE) * c - c) AS tie3
          FROM mr),
    gsc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ng, sc,
                   CAST(COUNT(*) AS DOUBLE) * sc AS nl,
                   CAST(COUNT(*) AS DOUBLE) * sc * sc AS nl2
            FROM v GROUP BY sc),
    gs AS (SELECT SUM(nl) AS snl, SUM(nl2) AS snl2 FROM gsc),
    z AS (SELECT s.n, s.l_stat,
                 (s.n + 1) / 2.0 * gs.snl AS e_l,
                 (s.n + 1) / 12.0 * (s.n * gs.snl2 - gs.snl * gs.snl)
                 * (1.0 - s.tie3 / (s.n * s.n * s.n - s.n)) AS var_l
          FROM s CROSS JOIN gs)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(l_stat * 10000 + 0.5) / 10000 AS l_stat,
           FLOOR(e_l * 10000 + 0.5) / 10000 AS expected,
           FLOOR((l_stat - e_l) / SQRT(var_l) * 10000 + 0.5) / 10000
             AS z,
           FLOOR(2 * {normal_sf_sql("ABS((l_stat - e_l) / SQRT(var_l))")}
                 * 1000000 + 0.5) / 1000000 AS p_value
    FROM z
    """,
)
def stat_cuzick_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuzick's nonparametric trend test across the five order
    priorities as ORDERED doses (score = the priority's leading
    digit) with price as the response: L = Σ score·midrank, z from
    the exact tie-corrected permutation moments — one degree of
    freedom pointed along the ordering, so a monotone price-priority
    relationship shows up long before stat_kruskal_wallis's omnibus
    H does. Near-zero z on synthetic data IS the result: priority
    assignment doesn't price-discriminate.

    Scale: midranks come from collapsed value counts + the two-phase
    prefix sum (bucketed_cumsum — no single-task sort); group score
    moments are a 5-row aggregate; everything after is scalar
    algebra."""
    v = cat(spark, sf_dir)["orders"].select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("sc"),
        F.col("o_totalprice").alias("x"),
    )
    cnt = v.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("sc").cast("bigint").alias("ssc"),
    )
    cum = bucketed_cumsum(cnt, "x", {"cc": F.col("c")})
    mr = cum.select(
        "c",
        "ssc",
        (F.col("cc").cast("double") - (F.col("c") - 1) / 2.0).alias(
            "midrank"
        ),
    )
    s = mr.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum(F.col("ssc") * F.col("midrank")).alias("l_stat"),
        F.sum(
            F.col("c") * F.col("c").cast("double") * F.col("c") - F.col("c")
        ).alias("tie3"),
    )
    gs = (
        v.groupBy("sc")
        .agg(F.count(F.lit(1)).cast("double").alias("ng"))
        .agg(
            F.sum(F.col("ng") * F.col("sc")).alias("snl"),
            F.sum(F.col("ng") * F.col("sc") * F.col("sc")).alias("snl2"),
        )
    )
    z = s.crossJoin(F.broadcast(gs)).select(
        "n",
        "l_stat",
        ((F.col("n") + 1) / 2.0 * F.col("snl")).alias("e_l"),
        (
            (F.col("n") + 1)
            / 12.0
            * (F.col("n") * F.col("snl2") - F.col("snl") * F.col("snl"))
            * (
                1.0
                - F.col("tie3")
                / (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
            )
        ).alias("var_l"),
    )
    zs = (F.col("l_stat") - F.col("e_l")) / F.sqrt(F.col("var_l"))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return z.select(
        F.col("n").cast("bigint").alias("n"),
        rnd(F.col("l_stat"), 4).alias("l_stat"),
        rnd(F.col("e_l"), 4).alias("expected"),
        rnd(zs, 4).alias("z"),
        r6(2 * normal_sf(F.abs(zs))).alias("p_value"),
    )
