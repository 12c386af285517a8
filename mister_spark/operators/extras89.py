"""Wave 89: volatility bands, reliability metrics, count-model
fitting, and mergeable streaming decay state.

ev_bollinger_breakouts is the rolling mean ± 2σ envelope with
breakout flags — the volatility-aware alert threshold that a fixed
cutoff can't be; ev_mttr_mtbf computes the two numbers every
reliability review starts with (mean time between failures, mean time
to recovery) from the raw event stream; stat_negbin_fit fits a
negative binomial to per-user event counts by moments and
chi-square-scores it against the Poisson — the overdispersion
follow-up that says WHICH count model to use; stream_decayed_counts
is the streaming twin of ev_decayed_counts, carrying exponentially
aged state through foreachBatch with the multiplicative merge rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import ln_fact, ln_fact_sql
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

BB_WIN = 7  # rolling days
BB_SIGMA = 2.0
NB_CAP = 9  # count histogram buckets 0..CAP, tail lumped


@query(
    "ev_bollinger_breakouts",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      AVG(value) AS close
               FROM events GROUP BY 1),
    r AS (SELECT t, close,
                 AVG(close) OVER w AS mid,
                 STDDEV_SAMP(close) OVER w AS sd,
                 COUNT(*) OVER w AS nw
          FROM d
          WINDOW w AS (ORDER BY t ROWS BETWEEN {BB_WIN - 1} PRECEDING
                       AND CURRENT ROW))
    SELECT CAST(t AS BIGINT) AS t,
           FLOOR(close * 10000 + 0.5) / 10000 AS close,
           FLOOR(mid * 10000 + 0.5) / 10000 AS mid,
           FLOOR((mid - {BB_SIGMA} * sd) * 10000 + 0.5) / 10000 AS lower,
           FLOOR((mid + {BB_SIGMA} * sd) * 10000 + 0.5) / 10000 AS upper,
           CAST(CASE WHEN close > mid + {BB_SIGMA} * sd THEN 1
                     WHEN close < mid - {BB_SIGMA} * sd THEN -1
                     ELSE 0 END AS BIGINT) AS breakout
    FROM r WHERE nw = {BB_WIN}
    """,
)
def ev_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on the daily mean event value: {w}-day rolling
    mean ± {s}σ, with breakout = +1/−1 when the close pierces the
    band — the volatility-scaled alert that adapts where a fixed
    threshold pages for noise in calm weeks and sleeps through loud
    ones. Warm-up days (fewer than {w} in window) are dropped.

    Scale: the day rollup is the only data-sized shuffle; the rolling
    window runs on the |days| frame (calendar-bounded — the
    control-chart/MACD precedent)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "t"
            )
        )
        .agg(F.avg("value").alias("close"))
        .localCheckpoint()
    )
    w = W.orderBy("t").rowsBetween(-(BB_WIN - 1), 0)
    r = d.select(
        "t",
        "close",
        F.avg("close").over(w).alias("mid"),
        F.stddev_samp("close").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("nw"),
    ).filter(F.col("nw") == BB_WIN)
    up = F.col("mid") + BB_SIGMA * F.col("sd")
    lo = F.col("mid") - BB_SIGMA * F.col("sd")
    return r.select(
        F.col("t").cast("bigint").alias("t"),
        ratio(F.col("close")).alias("close"),
        ratio(F.col("mid")).alias("mid"),
        ratio(lo).alias("lower"),
        ratio(up).alias("upper"),
        F.when(F.col("close") > up, 1)
        .when(F.col("close") < lo, -1)
        .otherwise(0)
        .cast("bigint")
        .alias("breakout"),
    )


ev_bollinger_breakouts.__doc__ = ev_bollinger_breakouts.__doc__.format(
    w=BB_WIN, s=BB_SIGMA
)


@query(
    "ev_mttr_mtbf",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_err,
             MIN(CASE WHEN event_type <> 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_ok
      FROM events),
    err AS (SELECT * FROM s WHERE event_type = 'error')
    SELECT CAST(COUNT(*) AS BIGINT) AS n_errors,
           FLOOR(AVG(date_diff('second', ts, next_err)) / 3600.0
                 * 10000 + 0.5) / 10000 AS mtbf_hours,
           FLOOR(AVG(date_diff('second', ts, next_ok)) / 60.0
                 * 10000 + 0.5) / 10000 AS mttr_minutes
    FROM err
    """,
)
def ev_mttr_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF / MTTR from the raw event stream, per-user failure chains:
    MTBF = mean gap between a user's consecutive 'error' events;
    MTTR = mean time from an error to that user's next non-error
    event (recovery). The two numbers that anchor every reliability
    conversation — computed from the same exchange.

    Scale: ONE shuffle on user_id feeds both windows (an ordered
    per-user frame — the sessionize partitioning); averaging error
    rows is a final small aggregate. NULL gaps (last error, no
    recovery yet) drop out of both means in both engines."""
    ev = cat(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(1, W.unboundedFollowing)
    s = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "error", F.col("ts")))
        .over(wf)
        .alias("next_err"),
        F.min(
            F.when(F.col("event_type") != "error", F.col("ts"))
        )
        .over(wf)
        .alias("next_ok"),
    ).filter(F.col("event_type") == "error")
    gap_err = F.col("next_err").cast("long") - F.col("ts").cast("long")
    gap_ok = F.col("next_ok").cast("long") - F.col("ts").cast("long")
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_errors"),
        ratio(F.avg(gap_err) / 3600.0).alias("mtbf_hours"),
        ratio(F.avg(gap_ok) / 60.0).alias("mttr_minutes"),
    )


def _nb_lngamma_sql(x: str) -> str:
    # lngamma(x) = ln_fact(x) - ln(x) for x > 0 (shared Stirling form)
    return f"({ln_fact_sql(x)} - LN({x}))"


@query(
    "stat_negbin_fit",
    oracle=f"""
    WITH uu AS (SELECT DISTINCT user_id FROM events),
    dd AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
           FROM events),
    cnt AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS DOUBLE) AS k
            FROM events GROUP BY 1, 2),
    u AS (SELECT COALESCE(cnt.k, 0) AS k
          FROM uu CROSS JOIN dd
          LEFT JOIN cnt ON uu.user_id = cnt.user_id AND dd.day = cnt.day),
    m AS (SELECT AVG(k) AS mu, VAR_SAMP(k) AS v,
                 CAST(COUNT(*) AS DOUBLE) AS n FROM u),
    p AS (SELECT mu, v, n, mu / v AS pp, mu * mu / (v - mu) AS r FROM m),
    h AS (SELECT LEAST(CAST(k AS BIGINT), {NB_CAP}) AS b,
                 CAST(COUNT(*) AS DOUBLE) AS obs
          FROM u GROUP BY 1),
    e AS (SELECT h.b, h.obs, p.n, p.r, p.pp,
                 CASE WHEN h.b < {NB_CAP} THEN
                   EXP({_nb_lngamma_sql('(h.b + p.r)')}
                       - {_nb_lngamma_sql('p.r')} - {ln_fact_sql('h.b')}
                       + p.r * LN(p.pp) + h.b * LN(1 - p.pp))
                 ELSE NULL END AS pmf
          FROM h, p),
    t AS (SELECT SUM(CASE WHEN b < {NB_CAP} THEN pmf END) AS cum FROM e),
    x AS (SELECT e.b, e.obs,
                 e.n * COALESCE(e.pmf, 1 - t.cum) AS expd
          FROM e, t)
    SELECT CAST((SELECT COUNT(*) FROM x) - 3 AS BIGINT) AS dof,
           FLOOR((SELECT r FROM p) * 10000 + 0.5) / 10000 AS r,
           FLOOR((SELECT pp FROM p) * 10000 + 0.5) / 10000 AS p,
           FLOOR(SUM((obs - expd) * (obs - expd) / expd) * 10000 + 0.5)
             / 10000 AS chi2
    FROM x
    """,
)
def stat_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of per-user event counts by moments
    (r = μ²/(σ²−μ), p = μ/σ²) with a chi-square goodness score over
    the 0..{c}+ count histogram — the concrete follow-up to
    stat_overdispersion: not just 'Poisson is wrong' but 'NB(r, p)
    with THIS evidence'. The NB pmf is evaluated through the shared
    Stirling lngamma so both engines compute identical values.

    Counts are per user-DAY over the explicit user×day grid —
    structural zeros included, since a count model fit only to nonzero
    rows is silently zero-truncated.

    Scale: the grid is users × (calendar-bounded) days via a broadcast
    of the day dim — linear, no data-sized shuffle beyond the count
    rollup; the histogram is ≤{c}+2 rows and everything after is
    tiny-frame arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    day = F.date_trunc("day", "ts").cast("date")
    uu = ev.select("user_id").distinct()
    dd = ev.select(day.alias("day")).distinct()
    cnt = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    u = (
        uu.crossJoin(F.broadcast(dd))
        .join(cnt, ["user_id", "day"], "left")
        .select(F.coalesce("k", F.lit(0.0)).alias("k"))
        .localCheckpoint()
    )
    m = u.agg(
        F.avg("k").alias("mu"),
        F.var_samp("k").alias("v"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    p = m.select(
        "mu",
        "v",
        "n",
        (F.col("mu") / F.col("v")).alias("pp"),
        (F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu"))).alias("r"),
    )
    h = u.groupBy(
        F.least(F.col("k").cast("bigint"), F.lit(NB_CAP)).alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))

    def lngamma(x):
        return ln_fact(x) - F.log(x)

    e = h.crossJoin(F.broadcast(p)).withColumn(
        "pmf",
        F.when(
            F.col("b") < NB_CAP,
            F.exp(
                lngamma(F.col("b") + F.col("r"))
                - lngamma(F.col("r"))
                - ln_fact(F.col("b"))
                + F.col("r") * F.log("pp")
                + F.col("b") * F.log(1 - F.col("pp"))
            ),
        ),
    ).localCheckpoint()
    t = e.agg(
        F.sum(F.when(F.col("b") < NB_CAP, F.col("pmf"))).alias("cum")
    )
    x = e.crossJoin(F.broadcast(t)).select(
        "b",
        "obs",
        "r",
        "pp",
        (F.col("n") * F.coalesce("pmf", 1 - F.col("cum"))).alias("expd"),
    )
    return x.agg(
        (F.count(F.lit(1)) - 3).cast("bigint").alias("dof"),
        ratio(F.first("r")).alias("r"),
        ratio(F.first("pp")).alias("p"),
        ratio(
            F.sum(
                (F.col("obs") - F.col("expd"))
                * (F.col("obs") - F.col("expd"))
                / F.col("expd")
            )
        ).alias("chi2"),
    )


stat_negbin_fit.__doc__ = stat_negbin_fit.__doc__.format(c=NB_CAP)


@query(
    "stream_decayed_counts",
    # Real oracle: the mergeable-decay rule makes the bounded replay
    # equal the batch ev_decayed_counts on the shared 1e-4 floor grid
    # (pytest parity gate), so the oracle is that SQL plus the
    # 3-batch count the 3-chunk staging pins.
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS anchor FROM events),
    w AS (SELECT event_type,
                 EXP(-LN(2) / 14.0
                     * (date_diff('second', ts, anchor) / 86400.0)) AS wt
          FROM events, mx)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS raw_count,
           FLOOR(SUM(wt) * 10000 + 0.5) / 10000 AS decayed_count,
           FLOOR(SUM(wt) / COUNT(*) * 10000 + 0.5) / 10000 AS recency_index,
           CAST(3 AS BIGINT) AS n_batches
    FROM w GROUP BY 1
    """,
)
def stream_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ev_decayed_counts: foreachBatch maintains per
    event type the pair (anchor_ts, decayed_sum aged TO that anchor)
    and merges each micro-batch with the multiplicative rule
    state·2^(−Δt/h) + batch — the associative form that lets the same
    feature run as bounded reprocess here and as an always-on stream
    with identical numbers. Pytest pins exact-to-rounding parity with
    the batch operator on the bounded replay.

    Scale: state is |event types| rows (re-aggregated per batch — a
    partial-agg shuffle of the batch only); the sink merge is a
    |types|-row join, never data-sized."""
    from mister_spark.streaming.jobs import run_stream_decayed_counts

    return run_stream_decayed_counts(spark, sf_dir)
