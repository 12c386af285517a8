"""Wave 208: survival-model discrimination and circular association.

ml_survival_cindex is Harrell's concordance index for the day-one-
engagement risk factor on time-to-first-purchase — the standard
discrimination metric for survival models: of all comparable user
pairs (one converts first), how often does the higher-risk-factor
user convert first? ml_cox_ph (wave 204) fits the hazard ratio; the
C-index says whether that factor actually ORDERS users, the
survival-world AUC (and, like AUC, a pure pair-counting quantity —
exact integers here). stat_circular_corr is the Jammalamadaka-Sarma
circular-circular correlation between each user's click hour-of-day
and purchase hour-of-day: hours live on a circle, so Pearson on raw
hour numbers calls 23h vs 1h "far apart"; the circular version works
on angle deviations from the circular means. stat_circular_hour
describes ONE series' clock; this one asks whether two clocks AGREE.

Exactness: C-index counts are integer cell products over the
(duration, event, x) frame; circular correlation runs on per-user
trig sums of 24 shared hour-angle constants — only trig/sum ulps
drift, inside the grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

TWO_PI = 2.0 * math.pi


@query(
    "ml_survival_cindex",
    # Real oracle: the (t, x) cell frame carries integer event /
    # total counts; usable, concordant, and risk-tied pair totals are
    # integer cell-product sums over the ordered cell self-join, so
    # the C-index divides identical BIGINTs — one float division,
    # inside the grid.
    oracle="""
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts) // 86400000000) AS d0,
                      MIN(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) // 86400000000 END) AS dp
               FROM events GROUP BY 1),
    hz AS (SELECT MAX(epoch_us(ts) // 86400000000) AS maxd FROM events),
    fd AS (SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS c0
           FROM events e JOIN u ON u.user_id = e.user_id
           WHERE epoch_us(e.ts) // 86400000000 = u.d0
           GROUP BY 1),
    lab AS (SELECT CASE WHEN u.dp IS NOT NULL THEN u.dp - u.d0
                        ELSE hz.maxd - u.d0 END AS t,
                   CASE WHEN u.dp IS NOT NULL THEN 1 ELSE 0 END AS ev,
                   CASE WHEN f.c0 >= 2 THEN 1 ELSE 0 END AS x
            FROM u JOIN fd f ON f.user_id = u.user_id, hz),
    g AS (SELECT t, x, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ev) AS BIGINT) AS d
          FROM lab GROUP BY 1, 2),
    p AS (SELECT
            SUM(CASE WHEN a.t < b.t THEN a.d * b.n ELSE 0 END) AS usable,
            SUM(CASE WHEN a.t < b.t AND a.x > b.x
                     THEN a.d * b.n ELSE 0 END) AS conc,
            SUM(CASE WHEN a.t < b.t AND a.x = b.x
                     THEN a.d * b.n ELSE 0 END) AS tied
          FROM g a, g b),
    nn AS (SELECT CAST(SUM(n) AS BIGINT) AS n_users,
                  CAST(SUM(d) AS BIGINT) AS n_events
           FROM g)
    SELECT nn.n_users, nn.n_events,
           CAST(p.usable AS BIGINT) AS usable_pairs,
           CAST(p.conc AS BIGINT) AS concordant,
           CAST(p.tied AS BIGINT) AS risk_tied,
           FLOOR((p.conc + 0.5 * p.tied) / NULLIF(p.usable, 0)
                 * 1e6 + 0.5) / 1e6 AS c_index
    FROM p, nn
    """,
)
def ml_survival_cindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's C-index of day-one engagement as a conversion-risk
    factor: over every comparable user pair (the earlier one actually
    converted), count the pair concordant when the earlier converter
    carries the HIGHER risk factor, half-credit when the factors tie.
    C = 0.5 is coin-flip ordering, 1.0 perfect — the survival AUC
    that tells you whether ml_cox_ph's hazard ratio translates into
    usable ranking. Pure pair counting over the (duration, factor)
    cells, so it is exact.

    Scale: the same two per-user passes as ml_cox_ph collapse to a
    (duration x factor) cell frame bounded by the calendar; the pair
    stage compares cells, not users — integer cell-product sums. Map-
    side combinable throughout."""
    ev = cat(spark, sf_dir)["events"].select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "user_id",
        "event_type",
    ).localCheckpoint()
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("day").alias("d0"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("day"))
            ).alias("dp"),
        )
        .localCheckpoint()
    )
    fd = (
        ev.join(u.select("user_id", "d0"), "user_id")
        .filter(F.col("day") == F.col("d0"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c0"))
    )
    horizon = ev.agg(F.max("day").alias("maxd"))
    lab = (
        u.join(fd, "user_id")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("dp").isNotNull(), F.col("dp") - F.col("d0"))
            .otherwise(F.col("maxd") - F.col("d0"))
            .alias("t"),
            F.when(F.col("dp").isNotNull(), 1).otherwise(0).alias("ev"),
            F.when(F.col("c0") >= 2, 1).otherwise(0).alias("x"),
        )
    )
    g = lab.groupBy("t", "x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ev").alias("d")
    ).localCheckpoint()  # cell frame feeds both pair aliases + totals
    a = g.select(
        F.col("t").alias("ta"), F.col("x").alias("xa"), F.col("d").alias("da")
    )
    b = g.select(
        F.col("t").alias("tb"), F.col("x").alias("xb"), F.col("n").alias("nb")
    )
    pairs = a.crossJoin(F.broadcast(b))
    lt = F.col("ta") < F.col("tb")
    p = pairs.agg(
        F.sum(F.when(lt, F.col("da") * F.col("nb")).otherwise(0)).alias(
            "usable"
        ),
        F.sum(
            F.when(lt & (F.col("xa") > F.col("xb")), F.col("da") * F.col("nb"))
            .otherwise(0)
        ).alias("conc"),
        F.sum(
            F.when(
                lt & (F.col("xa") == F.col("xb")), F.col("da") * F.col("nb")
            ).otherwise(0)
        ).alias("tied"),
    )
    nn = g.agg(
        F.sum("n").alias("n_users"), F.sum("d").alias("n_events")
    )
    fin = nn.crossJoin(F.broadcast(p))
    return fin.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("usable").cast("bigint").alias("usable_pairs"),
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("tied").cast("bigint").alias("risk_tied"),
        rnd(
            (F.col("conc") + 0.5 * F.col("tied"))
            / F.nullif(F.col("usable").cast("double"), F.lit(0.0)),
            6,
        ).alias("c_index"),
    )


@query(
    "stat_circular_corr",
    # Real oracle: hour angles are 24 shared constants; per-user trig
    # sums, circular means (ATAN2 of identical operands), and the
    # Jammalamadaka-Sarma ratio are the same closed forms in both
    # engines — trig/sum ulps only, inside the grid.
    oracle=f"""
    WITH ua AS (SELECT user_id,
                       SUM(CASE WHEN event_type = 'click'
                           THEN SIN({TWO_PI!r} * EXTRACT(hour FROM ts)
                                    / 24.0) ELSE 0 END) AS sc,
                       SUM(CASE WHEN event_type = 'click'
                           THEN COS({TWO_PI!r} * EXTRACT(hour FROM ts)
                                    / 24.0) ELSE 0 END) AS cc,
                       SUM(CASE WHEN event_type = 'purchase'
                           THEN SIN({TWO_PI!r} * EXTRACT(hour FROM ts)
                                    / 24.0) ELSE 0 END) AS sp,
                       SUM(CASE WHEN event_type = 'purchase'
                           THEN COS({TWO_PI!r} * EXTRACT(hour FROM ts)
                                    / 24.0) ELSE 0 END) AS cp,
                       SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS nc,
                       SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS np
                FROM events GROUP BY 1),
    ang AS (SELECT user_id, ATAN2(sc, cc) AS th, ATAN2(sp, cp) AS ph
            FROM ua WHERE nc > 0 AND np > 0),
    mu AS (SELECT ATAN2(SUM(SIN(th)), SUM(COS(th))) AS mth,
                  ATAN2(SUM(SIN(ph)), SUM(COS(ph))) AS mph,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM ang),
    s AS (SELECT mu.n,
                 SUM(SIN(a.th - mu.mth) * SIN(a.ph - mu.mph)) AS sxy,
                 SUM(SIN(a.th - mu.mth) * SIN(a.th - mu.mth)) AS sxx,
                 SUM(SIN(a.ph - mu.mph) * SIN(a.ph - mu.mph)) AS syy
          FROM ang a, mu GROUP BY mu.n)
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(CASE WHEN sxx * syy > 0
                 THEN sxy / SQRT(sxx * syy) ELSE 0.0 END * 1e6 + 0.5)
             / 1e6 AS circ_corr
    FROM s
    """,
)
def stat_circular_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jammalamadaka-Sarma circular correlation between each user's
    click clock and purchase clock: per user, the circular mean hour
    angle of clicks (theta) and purchases (phi); then r = sum
    sin(theta - theta_bar) sin(phi - phi_bar) / sqrt(sum sin^2 x sum
    sin^2). +1 = users buy at their personal click hour, -1 = at the
    antipodal hour, 0 = clocks unrelated. Pearson on raw hours calls
    23:00 vs 01:00 a 22-hour gap; on the circle it is 2 — this is the
    correlation that knows midnight wraps.

    Scale: ONE per-user conditional trig aggregation (map-side
    combinable, 24 shared constants), a 1-row circular-means frame
    broadcast back, one more aggregation. Closed form."""
    hour_angle = TWO_PI * F.hour("ts") / 24.0
    ua = (
        cat(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", F.sin(hour_angle))
                .otherwise(0.0)
            ).alias("sc"),
            F.sum(
                F.when(F.col("event_type") == "click", F.cos(hour_angle))
                .otherwise(0.0)
            ).alias("cc"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.sin(hour_angle)
                ).otherwise(0.0)
            ).alias("sp"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.cos(hour_angle)
                ).otherwise(0.0)
            ).alias("cp"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("nc"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
        )
    )
    ang = (
        ua.filter((F.col("nc") > 0) & (F.col("np") > 0))
        .select(
            F.atan2(F.col("sc"), F.col("cc")).alias("th"),
            F.atan2(F.col("sp"), F.col("cp")).alias("ph"),
        )
        .localCheckpoint()  # feeds means + deviation pass
    )
    mu = ang.agg(
        F.atan2(F.sum(F.sin("th")), F.sum(F.cos("th"))).alias("mth"),
        F.atan2(F.sum(F.sin("ph")), F.sum(F.cos("ph"))).alias("mph"),
        F.count(F.lit(1)).alias("n"),
    )
    dth = F.sin(F.col("th") - F.col("mth"))
    dph = F.sin(F.col("ph") - F.col("mph"))
    s = (
        ang.crossJoin(F.broadcast(mu))
        .groupBy("n")
        .agg(
            F.sum(dth * dph).alias("sxy"),
            F.sum(dth * dth).alias("sxx"),
            F.sum(dph * dph).alias("syy"),
        )
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        rnd(
            F.when(
                F.col("sxx") * F.col("syy") > 0,
                F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy")),
            ).otherwise(0.0),
            6,
        ).alias("circ_corr"),
    )
