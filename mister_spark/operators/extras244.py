"""Wave 244: Kalman level filtering and Granger lead-lag causality.

ev_kalman_level runs the local-level Kalman filter over daily event
volume per type: each day's filtered level blends the running estimate
with the observation, weighted by the gain the filter DERIVES from the
process/observation noise ratio — the principled version of the EWMA
smoothing ev_ewma hand-tunes (the steady-state Kalman gain IS the
optimal EWMA alpha for this model), plus a per-day variance that says
how much to trust the level. The recursion (level and variance at day
d feed day d+1) is the same WITH RECURSIVE string in both engines, the
ev_holt_smoothing pattern. stat_granger_causality asks which daily
series LEADS: clicks Granger-cause views if yesterday's clicks improve
today's view forecast beyond what yesterday's views already provide —
the nested-OLS F-test (restricted y_t ~ y_{t-1} vs unrestricted
y_t ~ y_{t-1} + x_{t-1}) run in BOTH directions from one pass of
integer moment sums. ev_cross_correlation scores the lag; Granger
tests whether the lead is predictive information, not echo.

Exactness: day counts are integers, so every moment sum is an exact
BIGINT; both OLS solves are Cramer closed forms dividing identical
operands, and the Kalman recursion rounds each iterate to 1e-6 on
noise constants that are exact binary fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

KL_Q = 25.0  # process noise (exact binary fraction)
KL_R = 100.0  # observation noise — gain settles near 0.4

_KALMAN_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
           FROM daily GROUP BY 1),
spine AS (SELECT b.event_type, unnest(generate_series(b.d0, b.d1)) AS day
          FROM bounds b),
gd AS (SELECT s.event_type, s.day, COALESCE(d.y, 0.0) AS y
       FROM spine s LEFT JOIN daily d
         ON d.event_type = s.event_type AND d.day = s.day),
kf(event_type, day, y, lvl, p, gain) AS (
  SELECT d.event_type, d.day, d.y, d.y, CAST({KL_R!r} AS DOUBLE),
         CAST(0.0 AS DOUBLE)
  FROM gd d JOIN bounds b
    ON d.event_type = b.event_type AND d.day = b.d0
  UNION ALL
  SELECT k.event_type, d.day, d.y,
         FLOOR((k.lvl + (k.p + {KL_Q!r}) / (k.p + {KL_Q!r} + {KL_R!r})
                * (d.y - k.lvl)) * 1000000 + 0.5) / 1000000,
         FLOOR(((1 - (k.p + {KL_Q!r}) / (k.p + {KL_Q!r} + {KL_R!r}))
                * (k.p + {KL_Q!r})) * 1000000 + 0.5) / 1000000,
         FLOOR((k.p + {KL_Q!r}) / (k.p + {KL_Q!r} + {KL_R!r})
               * 1000000 + 0.5) / 1000000
  FROM kf k JOIN gd d
    ON d.event_type = k.event_type AND d.day = k.day + 1
)
SELECT event_type, day, CAST(y AS BIGINT) AS n_events,
       FLOOR(lvl * 10000 + 0.5) / 10000 AS level,
       FLOOR(p * 10000 + 0.5) / 10000 AS variance,
       FLOOR(gain * 10000 + 0.5) / 10000 AS kalman_gain
FROM kf
"""

_KALMAN_SQL_SPARK = _KALMAN_SQL.replace(
    "epoch_us(ts) //", "unix_micros(ts) div"
).replace(
    "unnest(generate_series(b.d0, b.d1))", "explode(sequence(b.d0, b.d1))"
)


@query("ev_kalman_level", oracle=_KALMAN_SQL)
def ev_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter on daily event counts per type
    (Q={q:g}, R={r:g}): predict P+Q, gain K = (P+Q)/(P+Q+R), update
    level += K * innovation, variance = (1-K)(P+Q), seeded at the
    first day's count. The gain converges to the steady state the
    noise ratio dictates — the filter LEARNS how much smoothing the
    series deserves, where ev_ewma's alpha is a guess; `variance` is
    the running error bar an alerting rule can threshold honestly.

    Scale: the anchor is the daily rollup (one map-side-combinable
    data-sized shuffle); the recursion advances ≤ |types| rows per
    step along a gap-filled generate_series day spine (a missing day
    reads as y=0 instead of silently truncating all later days, the
    stat_granger_causality pattern) with calendar-bounded depth, and
    the identical SQL string runs on both engines (iterates rounded
    to 1e-6; Q and R are exact binary fractions)."""
    cat(spark, sf_dir)["events"].createOrReplaceTempView("events")
    return spark.sql(_KALMAN_SQL_SPARK)


ev_kalman_level.__doc__ = ev_kalman_level.__doc__.format(q=KL_Q, r=KL_R)

GC_A = "click"  # candidate cause series
GC_B = "view"  # candidate effect series


def _granger_oracle() -> str:
    # one integer moment-sum pass, then both nested-OLS F-tests as
    # Cramer closed forms over the shared sums
    sums = """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
             CAST(SUM(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
      FROM events WHERE event_type IN ('{a}', '{b}') GROUP BY 1),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day
              FROM bounds b),
    g AS (SELECT s.day, COALESCE(d.xa, 0) AS xa, COALESCE(d.xb, 0) AS xb
          FROM spine s LEFT JOIN daily d ON d.day = s.day),
    lagf AS (SELECT c.xa AS a, c.xb AS b, p.xa AS al, p.xb AS bl
             FROM g c JOIN g p ON p.day = c.day - 1),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(a) AS sa, SUM(b) AS sb,
                   SUM(al) AS sal, SUM(bl) AS sbl,
                   SUM(a * a) AS saa, SUM(b * b) AS sbb,
                   SUM(al * al) AS sall, SUM(bl * bl) AS sbll,
                   SUM(a * al) AS saal, SUM(a * bl) AS sabl,
                   SUM(b * al) AS sbal, SUM(b * bl) AS sbbl,
                   SUM(al * bl) AS salbl
            FROM lagf)
    """.format(a=GC_A, b=GC_B)
    # direction template: dep y with own lag o and other lag z —
    # Syy/Soo/Szz etc. are centered moments from the raw integer sums
    def direction(label, syy, sy, soo, so, szz, sz, soy, szy, soz):
        return f"""
    SELECT '{label}' AS direction, n AS n_obs, f_stat, p_value,
           beta_other
    FROM (
      SELECT n,
        FLOOR(CASE WHEN den <= 0 OR rss_u <= 0 OR n <= 3 THEN 0.0
              ELSE GREATEST(rss_r - rss_u, 0.0) / (rss_u / (n - 3))
              END * 10000 + 0.5) / 10000 AS f_stat,
        FLOOR(CASE WHEN den <= 0 OR rss_u <= 0 OR n <= 3 THEN 1.0
              ELSE 2 * {normal_sf_sql(
                  "SQRT(GREATEST(rss_r - rss_u, 0.0) / (rss_u / (n - 3)))"
              )} END * 1000000 + 0.5) / 1000000 AS p_value,
        FLOOR(CASE WHEN den <= 0 THEN 0.0 ELSE b2 END
              * 1000000 + 0.5) / 1000000 AS beta_other
      FROM (
        SELECT n, den,
               syy - CASE WHEN soo2 <= 0 THEN 0.0
                     ELSE soy2 * soy2 / soo2 END AS rss_r,
               syy - b1 * soy2 - b2 * szy2 AS rss_u, b2
        FROM (
          SELECT n, den, syy, soo2, soy2, szy2,
                 CASE WHEN den <= 0 THEN 0.0
                      ELSE (soy2 * szz2 - szy2 * soz2) / den END AS b1,
                 CASE WHEN den <= 0 THEN 0.0
                      ELSE (szy2 * soo2 - soy2 * soz2) / den END AS b2
          FROM (
            SELECT n,
                   {syy} - CAST({sy} AS DOUBLE) * {sy} / n AS syy,
                   {soo} - CAST({so} AS DOUBLE) * {so} / n AS soo2,
                   {szz} - CAST({sz} AS DOUBLE) * {sz} / n AS szz2,
                   {soy} - CAST({so} AS DOUBLE) * {sy} / n AS soy2,
                   {szy} - CAST({sz} AS DOUBLE) * {sy} / n AS szy2,
                   {soz} - CAST({so} AS DOUBLE) * {sz} / n AS soz2,
                   ({soo} - CAST({so} AS DOUBLE) * {so} / n)
                   * ({szz} - CAST({sz} AS DOUBLE) * {sz} / n)
                   - ({soz} - CAST({so} AS DOUBLE) * {sz} / n)
                   * ({soz} - CAST({so} AS DOUBLE) * {sz} / n) AS den
            FROM mom)))) q
    """

    d1 = direction(
        f"{GC_A}->{GC_B}",
        "sbb", "sb", "sbll", "sbl", "sall", "sal", "sbbl", "sbal", "salbl",
    )
    d2 = direction(
        f"{GC_B}->{GC_A}",
        "saa", "sa", "sall", "sal", "sbll", "sbl", "saal", "sabl", "salbl",
    )
    return sums + d1 + "UNION ALL" + d2


@query("stat_granger_causality", oracle=_granger_oracle())
def stat_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger lead-lag test between daily {a} and {b} volumes, BOTH
    directions from one moment-sum pass: restricted OLS y_t on
    y_(t-1) vs unrestricted adding x_(t-1); F = (RSS_r - RSS_u) /
    (RSS_u / (n - 3)) with the asymptotic chi-square(1) tail
    (F = z^2, p = 2 * normal_sf(sqrt(F))). A small p in one direction
    only is the actionable shape: yesterday's {a}s carry forecast
    information about today's {b}s that {b}'s own history lacks.
    ev_cross_correlation measures lag alignment; this tests
    PREDICTIVE content, the difference between echo and lead.

    Scale: one map-side-combinable daily rollup shuffle, a
    calendar-bounded spine join, ONE 13-sum aggregate (all integer
    moments, so the sums are exact), and two closed-form Cramer
    solves on the 1-row frame — no matrix library, no second pass."""
    ev = (
        cat(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin(GC_A, GC_B))
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.when(F.col("event_type") == GC_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == GC_B, 1).otherwise(0).alias("ib"),
        )
    )
    daily = ev.groupBy("day").agg(
        F.sum("ia").cast("bigint").alias("xa"),
        F.sum("ib").cast("bigint").alias("xb"),
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    g = (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("xa", F.lit(0)).alias("xa"),
            F.coalesce("xb", F.lit(0)).alias("xb"),
        )
        .localCheckpoint()  # calendar-bounded; feeds both lag sides
    )
    prev = g.select(
        (F.col("day") + 1).alias("day"),
        F.col("xa").alias("al"),
        F.col("xb").alias("bl"),
    )
    lagf = g.join(prev, "day").select(
        F.col("xa").alias("a"), F.col("xb").alias("b"), "al", "bl"
    )
    mom = lagf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"), F.sum("b").alias("sb"),
        F.sum("al").alias("sal"), F.sum("bl").alias("sbl"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("al") * F.col("al")).alias("sall"),
        F.sum(F.col("bl") * F.col("bl")).alias("sbll"),
        F.sum(F.col("a") * F.col("al")).alias("saal"),
        F.sum(F.col("a") * F.col("bl")).alias("sabl"),
        F.sum(F.col("b") * F.col("al")).alias("sbal"),
        F.sum(F.col("b") * F.col("bl")).alias("sbbl"),
        F.sum(F.col("al") * F.col("bl")).alias("salbl"),
    ).localCheckpoint()  # 1 row, feeds both directions

    def cm(sxy: str, sx: str, sy: str) -> F.Column:
        return F.col(sxy) - F.col(sx).cast("double") * F.col(sy) / F.col("n")

    def direction(label: str, syy, sy, soo, so, szz, sz, soy, szy, soz):
        c_yy = cm(syy, sy, sy)
        c_oo = cm(soo, so, so)
        c_zz = cm(szz, sz, sz)
        c_oy = cm(soy, so, sy)
        c_zy = cm(szy, sz, sy)
        c_oz = cm(soz, so, sz)
        den = c_oo * c_zz - c_oz * c_oz
        b1 = F.when(den <= 0, 0.0).otherwise((c_oy * c_zz - c_zy * c_oz) / den)
        b2 = F.when(den <= 0, 0.0).otherwise((c_zy * c_oo - c_oy * c_oz) / den)
        rss_r = c_yy - F.when(c_oo <= 0, 0.0).otherwise(c_oy * c_oy / c_oo)
        rss_u = c_yy - b1 * c_oy - b2 * c_zy
        bad = (den <= 0) | (rss_u <= 0) | (F.col("n") <= 3)
        fstat = F.when(bad, 0.0).otherwise(
            F.greatest(rss_r - rss_u, F.lit(0.0)) / (rss_u / (F.col("n") - 3))
        )
        pval = F.when(bad, 1.0).otherwise(
            2
            * normal_sf(
                F.sqrt(
                    F.greatest(rss_r - rss_u, F.lit(0.0))
                    / (rss_u / (F.col("n") - 3))
                )
            )
        )
        return mom.select(
            F.lit(label).alias("direction"),
            F.col("n").alias("n_obs"),
            rnd(fstat, 4).alias("f_stat"),
            rnd(pval, 6).alias("p_value"),
            rnd(F.when(den <= 0, 0.0).otherwise(b2), 6).alias("beta_other"),
        )

    d1 = direction(
        f"{GC_A}->{GC_B}",
        "sbb", "sb", "sbll", "sbl", "sall", "sal", "sbbl", "sbal", "salbl",
    )
    d2 = direction(
        f"{GC_B}->{GC_A}",
        "saa", "sa", "sall", "sal", "sbll", "sbl", "saal", "sabl", "salbl",
    )
    return d1.unionByName(d2)


stat_granger_causality.__doc__ = stat_granger_causality.__doc__.format(
    a=GC_A, b=GC_B
)
