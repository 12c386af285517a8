"""Wave 158: trending terms and payback periods.

tx_trending_terms surfaces the tokens whose second-half share rose
most against their smoothed first-half share — the trend detector
behind 'what's new in this corpus', with additive smoothing so
brand-new rare terms don't dominate by dividing by almost-zero;
ev_payback_period computes, per signup cohort, the day cumulative
revenue crosses an assumed acquisition cost — THE unit-economics
number, derived end-to-end from events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

TREND_TOP = 10
TREND_SMOOTH = 5.0
CAC = 200.0  # assumed acquisition cost per user


@query(
    "tx_trending_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id % 2 AS half, unnest({DUCK_TOKENS}) AS tok
               FROM documents),
    c AS (SELECT tok,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS c1,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS c2
          FROM t GROUP BY 1),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
    r AS (SELECT c.tok,
                 (c.c2 / tot.n2) AS share2,
                 (c.c1 + {TREND_SMOOTH}) / (tot.n1 + {TREND_SMOOTH})
                   AS share1_smooth,
                 (c.c2 / tot.n2)
                   / ((c.c1 + {TREND_SMOOTH}) / (tot.n1 + {TREND_SMOOTH}))
                   AS trend
          FROM c, tot)
    SELECT tok, FLOOR(share2 * 1000000 + 0.5) / 1000000 AS share_recent,
           FLOOR(trend * 10000 + 0.5) / 10000 AS trend_ratio
    FROM r
    ORDER BY FLOOR(trend * 10000 + 0.5) / 10000 DESC, tok
    LIMIT {TREND_TOP}
    """,
)
def tx_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending terms: second-half token share over the additively-
    smoothed first-half share (+{s} pseudo-counts — the smoothing
    that stops a term appearing twice-from-once from 'trending' 2×).
    Top-{k} by the rounded ratio with token tie-break. The
    what's-new surface a corpus monitor pages on.

    Scale: one conditional token rollup; the ratio and top-k are
    |vocab|-frame arithmetic and a TakeOrdered."""
    t = cat(spark, sf_dir)["documents"].select(
        (F.col("doc_id") % 2).alias("half"), F.explode(tokens()).alias("tok")
    )
    c = t.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("double")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("double")
        .alias("c2"),
    )
    tot = c.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    r = c.crossJoin(F.broadcast(tot)).select(
        "tok",
        (F.col("c2") / F.col("n2")).alias("share2"),
        (
            (F.col("c2") / F.col("n2"))
            / (
                (F.col("c1") + TREND_SMOOTH)
                / (F.col("n1") + TREND_SMOOTH)
            )
        ).alias("trend"),
    )
    return (
        r.select(
            "tok",
            (F.floor(F.col("share2") * 1000000 + 0.5) / 1000000).alias(
                "share_recent"
            ),
            ratio(F.col("trend")).alias("trend_ratio"),
        )
        .orderBy(F.col("trend_ratio").desc(), "tok")
        .limit(TREND_TOP)
    )


tx_trending_terms.__doc__ = tx_trending_terms.__doc__.format(
    s=TREND_SMOOTH, k=TREND_TOP
)


@query(
    "ev_payback_period",
    oracle=f"""
    WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
               GROUP BY 1),
    rev AS (SELECT e.user_id,
                   CAST(FLOOR((epoch_us(e.ts) - u.t0) / 86400000000.0)
                        AS BIGINT) AS age_day,
                   SUM(CASE WHEN e.event_type = 'purchase'
                            THEN e.value ELSE 0 END) AS r
            FROM events e JOIN u ON e.user_id = u.user_id
            GROUP BY 1, 2),
    daily AS (SELECT age_day,
                     SUM(r) / (SELECT COUNT(*) FROM u) AS rev_per_user
              FROM rev GROUP BY 1),
    cum AS (SELECT age_day,
                   SUM(rev_per_user) OVER (ORDER BY age_day) AS cum_ltv
            FROM daily)
    SELECT CAST(MIN(CASE WHEN cum_ltv >= {CAC} THEN age_day END)
                AS BIGINT) AS payback_day,
           FLOOR(MAX(cum_ltv) * 100 + 0.5) / 100 AS ltv_at_horizon,
           CAST({CAC} AS DOUBLE) AS assumed_cac
    FROM cum
    """,
)
def ev_payback_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payback period: cumulative purchase revenue per user by
    account-age day, and the first day it crosses the assumed ${c:.0f}
    acquisition cost — NULL payback with LTV-at-horizon below CAC is
    the 'unit economics don't close yet' answer, in one row. The
    age-day normalization (not calendar day) is what makes cohorts of
    different vintages comparable.

    Scale: per-(user, age-day) revenue in one shuffle; the cumulative
    curve rides the age-bounded day frame (calendar precedent)."""
    ev = cat(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    u = ev.groupBy("user_id").agg(F.min(us).alias("t0"))
    n_users = u.count()
    rev = (
        ev.join(u, "user_id")
        .groupBy(
            "user_id",
            F.floor((us - F.col("t0")) / 86400000000.0)
            .cast("bigint")
            .alias("age_day"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("r")
        )
    )
    daily = rev.groupBy("age_day").agg(
        (F.sum("r") / F.lit(float(n_users))).alias("rev_per_user")
    )
    w = W.orderBy("age_day").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select(
        "age_day", F.sum("rev_per_user").over(w).alias("cum_ltv")
    )
    return cum.agg(
        F.min(
            F.when(F.col("cum_ltv") >= CAC, F.col("age_day"))
        )
        .cast("bigint")
        .alias("payback_day"),
        (F.floor(F.max("cum_ltv") * 100 + 0.5) / 100).alias(
            "ltv_at_horizon"
        ),
        F.lit(CAC).alias("assumed_cac"),
    )


ev_payback_period.__doc__ = ev_payback_period.__doc__.format(c=CAC)
