"""Wave 245: elastic series alignment and circadian concentration.

stat_dtw_daily computes the dynamic-time-warping distance between the
daily click and view volume curves: the DP over the |a_i - b_j| cost
grid finds the cheapest monotone alignment, so a shape that repeats
with a variable lag scores close even where the lockstep L1 distance
explodes — the standard "same shape, shifted phase" series metric, with
the lockstep L1 alongside as the rigid baseline (dtw <= lockstep
always; a small ratio = the series match up to warping).
stat_circular_hours treats event hour-of-day as an angle: the resultant
length of the unit vectors at 2*pi*h/24 measures how CONCENTRATED each
type's circadian profile is, the mean direction names its peak hour,
and the Rayleigh test (z = n R_bar^2 with the small-sample correction)
says whether the concentration beats uniform chance — hour-histogram
ops show the shape; this one puts a p-value on "this event type has a
time of day".

Exactness: day counts are integers, so every DTW cell is an exact
BIGINT (the oracle replays the DP cell-for-cell as a flat-list
recursion); circular sums share cos/sin of the same 24 double inputs
and round on coarse grids.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

DTW_A = "click"
DTW_B = "view"

_DTW_SPINE = f"""
    daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CASE WHEN event_type = '{DTW_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
             CAST(SUM(CASE WHEN event_type = '{DTW_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
      FROM events WHERE event_type IN ('{DTW_A}', '{DTW_B}') GROUP BY 1),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day
              FROM bounds b),
    g AS (SELECT s.day, COALESCE(d.xa, 0) AS xa, COALESCE(d.xb, 0) AS xb
          FROM spine s LEFT JOIN daily d ON d.day = s.day)
"""


def _dtw_oracle() -> str:
    # cell-for-cell row-major DP replay: state after t cells is the
    # flat 1-based grid prefix d[1..t]; cell c = t+1 sits at
    # i = t // n + 1, j = t % n + 1 (square grid: both series share
    # the gap-filled spine). All costs and cells are exact BIGINTs.
    return f"""
    WITH RECURSIVE {_DTW_SPINE},
    v AS (SELECT list(xa ORDER BY day) AS av, list(xb ORDER BY day) AS bv,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM g),
    dp(t, d) AS (
      SELECT CAST(1 AS BIGINT), [ABS(av[1] - bv[1])] FROM v
      UNION ALL
      SELECT dp.t + 1,
             list_append(dp.d,
               ABS(v.av[(dp.t // v.n) + 1] - v.bv[(dp.t % v.n) + 1])
               + CASE
                   WHEN dp.t // v.n = 0 THEN dp.d[dp.t]
                   WHEN dp.t % v.n = 0 THEN dp.d[(dp.t // v.n - 1) * v.n + 1]
                   ELSE LEAST(
                     dp.d[(dp.t // v.n - 1) * v.n + (dp.t % v.n) + 1],
                     dp.d[(dp.t // v.n) * v.n + (dp.t % v.n)],
                     dp.d[(dp.t // v.n - 1) * v.n + (dp.t % v.n)])
                 END)
      FROM dp, v WHERE dp.t < v.n * v.n),
    fin AS (SELECT d[CAST(v.n * v.n AS BIGINT)] AS dtw, v.n
            FROM dp, v WHERE dp.t = v.n * v.n),
    lock AS (SELECT CAST(SUM(ABS(xa - xb)) AS BIGINT) AS l1 FROM g)
    SELECT fin.n AS n_days, fin.dtw AS dtw_distance,
           lock.l1 AS lockstep_l1,
           FLOOR(CASE WHEN lock.l1 <= 0 THEN 1.0
                 ELSE CAST(fin.dtw AS DOUBLE) / lock.l1 END
                 * 10000 + 0.5) / 10000 AS warp_ratio
    FROM fin, lock
    """


@query("stat_dtw_daily", oracle=_dtw_oracle())
def stat_dtw_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the daily {a} and {b}
    volume curves over the gap-filled common spine: DP over the
    |a_i - b_j| grid with the standard 3-way recurrence, plus the
    lockstep L1 as the rigid baseline. warp_ratio = dtw / L1 is the
    phase-shift detector: near 1 = the series differ in SHAPE; small
    = they share a shape the calendar merely shifts (promotions,
    delayed conversions, timezone mixes).

    Scale: the anchor is one map-side-combinable daily rollup; the DP
    runs on the calendar-bounded day frame (|days|^2 integer cells)
    in the driver, and the oracle replays it cell-for-cell as a
    flat-list recursion. At an n where |days|^2 matters the standard
    move is the Sakoe-Chiba band on the same recurrence."""
    ev = (
        cat(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin(DTW_A, DTW_B))
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.when(F.col("event_type") == DTW_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == DTW_B, 1).otherwise(0).alias("ib"),
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
    rows = (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("xa", F.lit(0)).alias("xa"),
            F.coalesce("xb", F.lit(0)).alias("xb"),
        )
        .orderBy("day")
        .collect()  # calendar-bounded day frame
    )
    a = [r["xa"] for r in rows]
    b = [r["xb"] for r in rows]
    n = len(a)
    prev: list[int] = []
    for i in range(n):
        cur: list[int] = []
        for j in range(n):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                cur.append(c)
            elif i == 0:
                cur.append(c + cur[j - 1])
            elif j == 0:
                cur.append(c + prev[0])
            else:
                cur.append(c + min(prev[j], cur[j - 1], prev[j - 1]))
        prev = cur
    dtw = prev[n - 1]
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    ratio = 1.0 if l1 <= 0 else dtw / l1
    g4 = math.floor(ratio * 1e4 + 0.5) / 1e4
    return spark.createDataFrame(
        [(n, dtw, l1, g4)],
        "n_days long, dtw_distance long, lockstep_l1 long, "
        "warp_ratio double",
    )


stat_dtw_daily.__doc__ = stat_dtw_daily.__doc__.format(a=DTW_A, b=DTW_B)

_TAU_24 = 2.0 * math.pi / 24.0


def _circular_oracle() -> str:
    return f"""
    WITH h AS (SELECT event_type,
                      CAST(date_part('hour', ts) AS BIGINT) AS hr
               FROM events),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(COS({_TAU_24!r} * hr)) AS cc,
                 SUM(SIN({_TAU_24!r} * hr)) AS ss
          FROM h GROUP BY 1),
    r AS (SELECT event_type, n, SQRT(cc * cc + ss * ss) / n AS rbar,
                 ATAN2(ss, cc) AS theta
          FROM s),
    z AS (SELECT event_type, n, rbar, theta,
                 n * rbar * rbar AS zr
          FROM r)
    SELECT event_type, n AS n_events,
           FLOOR((CASE WHEN theta < 0 THEN theta + {2 * math.pi!r}
                  ELSE theta END / {_TAU_24!r}) * 100 + 0.5) / 100
             AS mean_hour,
           FLOOR(rbar * 10000 + 0.5) / 10000 AS resultant,
           FLOOR(zr * 10000 + 0.5) / 10000 AS rayleigh_z,
           FLOOR(EXP(-zr) * (1 + (2 * zr - zr * zr) / (4 * n))
                 * 1000000 + 0.5) / 1000000 AS rayleigh_p
    FROM z
    """


@query("stat_circular_hours", oracle=_circular_oracle())
def stat_circular_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event hour-of-day per type: unit vectors
    at angle 2*pi*h/24, resultant length R_bar (1 = all events at one
    hour, 0 = uniform clock), mean direction converted back to a peak
    hour, and the Rayleigh uniformity test z = n R_bar^2 with the
    standard small-sample tail correction. Linear hour averages break
    at midnight (23:00 and 01:00 "average" to noon); the circular mean
    is the right mean for anything on a clock, and rayleigh_p is the
    gate for "does this event type HAVE a time of day".

    Scale: one narrow map + a per-type 3-sum aggregate, map-side
    combinable; everything after is closed-form algebra on the
    |types|-row frame."""
    h = cat(spark, sf_dir)["events"].select(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    )
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.cos(F.lit(_TAU_24) * F.col("hr"))).alias("cc"),
        F.sum(F.sin(F.lit(_TAU_24) * F.col("hr"))).alias("ss"),
    )
    rbar = F.sqrt(F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss")) / F.col("n")
    theta = F.atan2(F.col("ss"), F.col("cc"))
    zr = F.col("n") * rbar * rbar
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        rnd(
            F.when(theta < 0, theta + 2 * math.pi).otherwise(theta)
            / F.lit(_TAU_24),
            2,
        ).alias("mean_hour"),
        rnd(rbar, 4).alias("resultant"),
        rnd(zr, 4).alias("rayleigh_z"),
        rnd(
            F.exp(-zr) * (1 + (2 * zr - zr * zr) / (4 * F.col("n"))), 6
        ).alias("rayleigh_p"),
    )
