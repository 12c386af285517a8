"""Wave 229: recurrent-event curves and anytime-valid drift betting.

ev_mean_cumulative_function is the Nelson-Aalen-style MCF for
RECURRENT events: users enter the risk set at their first event day
(staggered entry), and MCF(t) accumulates (events that day by
at-risk users) / (users at risk) — the expected cumulative event
count per user as a function of exposure time. ev_survival answers
"when does the FIRST event happen"; the MCF answers "how many events
does a user keep generating" — repairs, purchases, support tickets.
stat_betting_martingale is sequential testing by betting: wager a
fixed fraction on "tomorrow is up" (and, in a parallel book, on
"down") against the exchangeability null of fair daily directions;
the running wealth is an e-process, so the MAXIMUM wealth is valid
evidence at ANY stopping time (no peeking penalty), and wealth
crossing 1/alpha = 20 is a sequential detection with guaranteed
anytime validity — the modern replacement for fixed-horizon tests a
monitor would have to pre-register (ev_msprt needs a parametric
alternative; the bet does not).

Exactness: MCF is integer counts and rational increments on the
calendar-bounded frame; the wealth process is exp of cumulative
integer-weighted logs of shared decimal literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
BET_LAMBDA = 0.5  # betting fraction
BET_THRESH = 20.0  # 1/alpha wealth threshold


@query(
    "ev_mean_cumulative_function",
    # Real oracle: entry days, at-risk counts and event increments
    # are integers from the exact day grid; MCF is a running sum of
    # identical rationals, rounded per day.
    oracle=f"""
    WITH e AS (SELECT user_id,
                      date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                        AS t
               FROM events),
    entry AS (SELECT user_id, MIN(t) AS t0 FROM e GROUP BY 1),
    days AS (SELECT DISTINCT t FROM e),
    atrisk AS (SELECT d.t, CAST(COUNT(*) AS BIGINT) AS y
               FROM days d JOIN entry ON entry.t0 <= d.t GROUP BY 1),
    dn AS (SELECT e.t, CAST(COUNT(*) AS BIGINT) AS ev
           FROM e JOIN entry ON entry.user_id = e.user_id
           WHERE e.t > entry.t0 GROUP BY 1),
    inc AS (SELECT a.t, a.y, COALESCE(dn.ev, 0) AS ev,
                   CAST(COALESCE(dn.ev, 0) AS DOUBLE) / a.y AS d_mcf
            FROM atrisk a LEFT JOIN dn ON dn.t = a.t),
    curve AS (SELECT t, y, ev,
                     SUM(d_mcf) OVER (ORDER BY t) AS mcf
              FROM inc)
    SELECT strftime(DATE '{EPOCH}' + CAST(t AS INT), '%Y-%m-%d') AS day,
           y AS at_risk, ev AS events,
           FLOOR(mcf * 1e4 + 0.5) / 1e4 AS mcf
    FROM curve
    """,
)
def ev_mean_cumulative_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cumulative function for recurrent events with staggered
    entry: a user is at risk from their first event day, each later
    event adds 1/(users at risk) to the curve, and MCF(t) reads as
    "expected events per user after being active through day t".
    Slope changes localize engagement shifts the way a hazard curve
    localizes churn; the curve ev_survival can't draw because it
    stops at the first event.

    Scale: one day-grain pass for entries and increments; the
    at-risk join and running sum live on the calendar-bounded day
    frame (the documented model-sized carry)."""
    e = (
        cat(spark, sf_dir)["events"]
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t"),
        )
        .localCheckpoint()  # feeds entry + increments
    )
    entry = e.groupBy("user_id").agg(F.min("t").alias("t0")).localCheckpoint()
    days = e.select("t").distinct()
    atrisk = (
        days.join(F.broadcast(entry), F.col("t0") <= F.col("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    dn = (
        e.join(entry, "user_id")
        .filter(F.col("t") > F.col("t0"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ev"))
    )
    inc = atrisk.join(dn, "t", "left").select(
        "t", "y",
        F.coalesce(F.col("ev"), F.lit(0)).alias("ev"),
        (
            F.coalesce(F.col("ev"), F.lit(0)).cast("double") / F.col("y")
        ).alias("d_mcf"),
    )
    curve = inc.select(
        "t", "y", "ev",
        F.sum("d_mcf")
        .over(W.orderBy("t").rowsBetween(W.unboundedPreceding, 0))
        .alias("mcf"),
    )
    return curve.select(
        F.date_format(
            F.date_add(F.lit(EPOCH).cast("date"), F.col("t").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        F.col("y").alias("at_risk"),
        F.col("ev").alias("events"),
        rnd(F.col("mcf"), 4).alias("mcf"),
    )


@query(
    "stat_betting_martingale",
    # Real oracle: direction bits are integer comparisons, both
    # wealth books are exp of integer-weighted cumulative logs of
    # the shared lambda literals, and the crossing day / max wealth
    # read the rounded grid with earliest-day tiebreaks.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    b AS (SELECT t,
                 CASE WHEN y > LAG(y) OVER (ORDER BY t) THEN 1
                      WHEN y < LAG(y) OVER (ORDER BY t) THEN 0
                 END AS up
          FROM d QUALIFY up IS NOT NULL),
    w AS (SELECT t, up,
                 SUM(CASE WHEN up = 1 THEN LN(1 + {BET_LAMBDA})
                          ELSE LN(1 - {BET_LAMBDA}) END)
                   OVER (ORDER BY t) AS lw_up,
                 SUM(CASE WHEN up = 0 THEN LN(1 + {BET_LAMBDA})
                          ELSE LN(1 - {BET_LAMBDA}) END)
                   OVER (ORDER BY t) AS lw_dn
          FROM b),
    ww AS (SELECT t, EXP(lw_up) AS wu, EXP(lw_dn) AS wd FROM w),
    mx AS (SELECT MAX(GREATEST(wu, wd)) AS peak,
                  CAST(COUNT(*) AS BIGINT) AS n_bets,
                  CAST(SUM(CASE WHEN GREATEST(wu, wd)
                       >= {BET_THRESH} THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_over
           FROM ww),
    cross_t AS (SELECT t FROM ww
                WHERE GREATEST(wu, wd) >= {BET_THRESH}
                ORDER BY t LIMIT 1),
    fin AS (SELECT wu, wd FROM ww ORDER BY t DESC LIMIT 1)
    SELECT mx.n_bets,
           FLOOR(mx.peak * 1e4 + 0.5) / 1e4 AS peak_wealth,
           FLOOR(GREATEST(fin.wu, fin.wd) * 1e4 + 0.5) / 1e4
             AS final_wealth,
           CAST(CASE WHEN mx.n_over > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS detected,
           COALESCE((SELECT strftime(DATE '{EPOCH}' + CAST(t AS INT),
                     '%Y-%m-%d') FROM cross_t), 'never')
             AS detection_day
    FROM mx, fin
    """,
)
def stat_betting_martingale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Testing-by-betting drift monitor on daily volume directions:
    two books bet fraction lambda = {lam} every day, one always on
    "up", one on "down", against the fair-direction null. Each book's
    wealth is an e-process, so peak wealth is valid evidence at any
    stopping time and the first day either book's wealth reaches
    {th} is an anytime-valid detection at alpha = 1/{th} — no
    horizon to pre-register, no peeking correction (the property
    fixed-sample tests fundamentally lack). ev_cusum_detect needs a
    reference scale and ev_msprt a parametric alternative; the bet
    needs only exchangeability.

    Scale: one day-grain count; direction bits, both cumulative-log
    books and the crossing scan are windows on the calendar-bounded
    frame."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint()
    )
    b = (
        d.select(
            "t",
            F.when(F.col("y") > F.lag("y").over(W.orderBy("t")), 1)
            .when(F.col("y") < F.lag("y").over(W.orderBy("t")), 0)
            .alias("up"),
        )
        .filter(F.col("up").isNotNull())
        .localCheckpoint()  # direction bits on the bounded day frame
    )
    import math

    lu = math.log(1 + BET_LAMBDA)
    ld = math.log(1 - BET_LAMBDA)
    w = b.select(
        "t",
        F.sum(
            F.when(F.col("up") == 1, F.lit(lu)).otherwise(F.lit(ld))
        )
        .over(W.orderBy("t").rowsBetween(W.unboundedPreceding, 0))
        .alias("lw_up"),
        F.sum(
            F.when(F.col("up") == 0, F.lit(lu)).otherwise(F.lit(ld))
        )
        .over(W.orderBy("t").rowsBetween(W.unboundedPreceding, 0))
        .alias("lw_dn"),
    )
    ww = w.select(
        "t", F.exp("lw_up").alias("wu"), F.exp("lw_dn").alias("wd")
    ).localCheckpoint()  # feeds peak, crossing, final
    best = F.greatest(F.col("wu"), F.col("wd"))
    mx = ww.agg(
        F.max(best).alias("peak"),
        F.count(F.lit(1)).alias("n_bets"),
        F.sum(F.when(best >= BET_THRESH, 1).otherwise(0)).alias("n_over"),
    )
    cross = (
        ww.filter(best >= BET_THRESH)
        .orderBy("t")
        .limit(1)
        .select(
            F.date_format(
                F.date_add(F.lit(EPOCH).cast("date"), F.col("t").cast("int")),
                "yyyy-MM-dd",
            ).alias("cd")
        )
    )
    fin = ww.orderBy(F.col("t").desc()).limit(1).select("wu", "wd")
    return (
        mx.crossJoin(F.broadcast(fin))
        .join(F.broadcast(cross), how="left")
        .select(
            F.col("n_bets").cast("bigint").alias("n_bets"),
            rnd(F.col("peak"), 4).alias("peak_wealth"),
            rnd(F.greatest(F.col("wu"), F.col("wd")), 4).alias(
                "final_wealth"
            ),
            F.when(F.col("n_over") > 0, 1).otherwise(0).cast("bigint").alias(
                "detected"
            ),
            F.coalesce(F.col("cd"), F.lit("never")).alias("detection_day"),
        )
    )


stat_betting_martingale.__doc__ = stat_betting_martingale.__doc__.format(
    lam=BET_LAMBDA, th=int(BET_THRESH)
)
