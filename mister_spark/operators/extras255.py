"""Wave 255: event-time alignment and benchmark-relative return ratios.

ev_event_study aligns every user's daily activity on THEIR OWN first
purchase (event time τ = day − first_purchase_day) and averages across
users per τ ∈ [−{w}, +{w}] — the leads-and-lags panel that shows what
behavior looks like approaching and following conversion, where a
calendar-time average smears every user's moment together.
fin_omega_ratio scores each market segment's monthly revenue returns
by the Omega ratio — Σ gains above threshold / Σ losses below it (θ=0)
— the full-distribution risk ratio that counts EVERY moment where
Sharpe's mean/σ compresses the tails away. fin_information_ratio asks
whether a nation's revenue stream beats the global book per unit of
tracking error: IR = mean(active return)/std(active return) annualized
— fin_revenue_beta says how much a nation co-moves; IR says whether
deviating from the market paid.

Exactness: event-time counts and monthly cents are integers; every
return, gain/loss sum, and IR moment divides identical operands;
outputs round on the 1e-4/1e-6 grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

ES_WINDOW = 7  # event-time window (days either side)
IR_PERIODS = 12  # monthly active returns, annualized by sqrt(12)


@query(
    "ev_event_study",
    # Real oracle: identical per-user first-purchase anchor, identical
    # (user, tau) daily activity counts (zero-filled inside the
    # window), integer sums averaged per tau.
    oracle=f"""
    WITH pday AS (SELECT user_id,
                         MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                           AS p0
                  FROM events WHERE event_type = 'purchase' GROUP BY 1),
    act AS (SELECT e.user_id,
                   CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - p.p0
                     AS tau,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events e JOIN pday p ON p.user_id = e.user_id
            GROUP BY 1, 2),
    grid AS (SELECT p.user_id, t.tau
             FROM pday p CROSS JOIN
                  (SELECT unnest(generate_series(-{ES_WINDOW},
                                                 {ES_WINDOW})) AS tau) t),
    filled AS (SELECT g.user_id, g.tau, COALESCE(a.n, 0) AS n
               FROM grid g LEFT JOIN act a
                 ON a.user_id = g.user_id AND a.tau = g.tau)
    SELECT CAST(tau AS BIGINT) AS tau,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS total_events,
           FLOOR(CAST(SUM(n) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS avg_events
    FROM filled GROUP BY 1 ORDER BY tau
    """,
)
def ev_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around each user's first purchase: per event-time
    day τ ∈ [−{w}, +{w}] (τ = day − that user's first purchase day,
    zero-filled where the user was silent), the average daily activity
    across all converting users — the leads/lags profile that shows
    the ramp INTO conversion and the echo after it, per-user-aligned
    where a calendar average smears every user's moment together.
    ev_did compares treated/control levels; this shows the SHAPE.

    Scale: one purchase-anchor rollup + one (user, τ) activity rollup
    (both map-combinable, shuffled on user_id); the zero-fill grid is
    users × (2·{w}+1) built from a broadcast τ spine; the final pass
    is a ({w}·2+1)-row aggregate."""
    ev = cat(spark, sf_dir)["events"]
    day = F.expr("unix_micros(ts) div 86400000000").cast("bigint")
    pday = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(day).alias("p0"))
    )
    act = (
        ev.select("user_id", day.alias("d"))
        .join(pday, "user_id")
        .select("user_id", (F.col("d") - F.col("p0")).alias("tau"))
        .groupBy("user_id", "tau")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    taus = spark.createDataFrame(
        [(t,) for t in range(-ES_WINDOW, ES_WINDOW + 1)], "tau long"
    )
    grid = pday.select("user_id").crossJoin(F.broadcast(taus))
    filled = grid.join(act, ["user_id", "tau"], "left").select(
        "tau", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return (
        filled.groupBy("tau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n").cast("bigint").alias("total_events"),
        )
        .select(
            F.col("tau").cast("bigint").alias("tau"),
            "n_users",
            "total_events",
            rnd(
                F.col("total_events").cast("double") / F.col("n_users"), 4
            ).alias("avg_events"),
        )
        .orderBy("tau")
    )


ev_event_study.__doc__ = ev_event_study.__doc__.format(w=ES_WINDOW)

# Shared monthly revenue-cents panel (exact integers) per grouping key.
_DUCK_MONTHLY = """
    rev AS (SELECT {key} AS k, date_trunc('month', o.o_orderdate) AS m,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS cents
            FROM orders o {joins}
            GROUP BY 1, 2),
    ret AS (SELECT k,
                   LN(CAST(cents AS DOUBLE)
                      / LAG(cents) OVER (PARTITION BY k ORDER BY m)) AS r,
                   m
            FROM rev)
"""


@query(
    "fin_omega_ratio",
    oracle=f"""
    WITH {_DUCK_MONTHLY.format(key="c.c_mktsegment",
                               joins="JOIN customer c ON c.c_custkey = o.o_custkey")},
    s AS (SELECT k AS seg, CAST(COUNT(r) AS BIGINT) AS n_months,
                 SUM(CASE WHEN r > 0 THEN r ELSE 0 END) AS gains,
                 SUM(CASE WHEN r < 0 THEN -r ELSE 0 END) AS losses
          FROM ret WHERE r IS NOT NULL GROUP BY 1)
    SELECT seg, n_months,
           FLOOR(gains * 1000000 + 0.5) / 1000000 AS gains,
           FLOOR(losses * 1000000 + 0.5) / 1000000 AS losses,
           FLOOR(CASE WHEN losses > 0 THEN gains / losses ELSE 0.0 END
                 * 10000 + 0.5) / 10000 AS omega
    FROM s ORDER BY seg
    """,
)
def fin_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Omega ratio (threshold 0) of each segment's monthly revenue
    log-returns: Σ gains / Σ losses over the WHOLE return
    distribution — up-months' total magnitude per unit of down-month
    magnitude. Unlike fin_sharpe_sortino's moment ratios, Omega uses
    every observation at face value (no normality assumed), so fat
    tails count exactly as much as they hurt.

    Scale: one fact join + (segment, month) integer-cents rollup; the
    return LAG rides the calendar-bounded panel; one grouped pass for
    the gain/loss sums."""
    c = cat(spark, sf_dir)
    rev = (
        c["orders"]
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .groupBy("seg", F.trunc("o_orderdate", "month").alias("m"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    w_lag = W.partitionBy("seg").orderBy("m")
    ret = rev.select(
        "seg",
        F.log(
            F.col("cents").cast("double")
            / F.lag("cents").over(w_lag).cast("double")
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    s = ret.groupBy("seg").agg(
        F.count("r").cast("bigint").alias("n_months"),
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0.0)).alias(
            "gains"
        ),
        F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0.0)).alias(
            "losses"
        ),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return s.select(
        "seg",
        "n_months",
        r6(F.col("gains")).alias("gains"),
        r6(F.col("losses")).alias("losses"),
        rnd(
            F.when(
                F.col("losses") > 0, F.col("gains") / F.col("losses")
            ).otherwise(0.0),
            4,
        ).alias("omega"),
    ).orderBy("seg")


@query(
    "fin_information_ratio",
    oracle=f"""
    WITH {_DUCK_MONTHLY.format(key="n.n_name",
                               joins='''JOIN customer c ON c.c_custkey = o.o_custkey
                 JOIN nation n ON n.n_nationkey = c.c_nationkey''')},
    mkt0 AS (SELECT date_trunc('month', o_orderdate) AS m,
                    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY 1),
    mret AS (SELECT m, LN(CAST(cents AS DOUBLE)
                          / LAG(cents) OVER (ORDER BY m)) AS rm
             FROM mkt0),
    act AS (SELECT ret.k AS nation, ret.r - mret.rm AS a
            FROM ret JOIN mret ON mret.m = ret.m
            WHERE ret.r IS NOT NULL AND mret.rm IS NOT NULL),
    s AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months,
                 AVG(a) AS ma,
                 SUM(a * a) AS saa, SUM(a) AS sa, COUNT(*) AS n
          FROM act GROUP BY 1)
    SELECT nation, n_months,
           FLOOR(ma * 1000000 + 0.5) / 1000000 AS mean_active,
           FLOOR(SQRT((saa - sa * sa / n) / (n - 1)) * 1000000 + 0.5)
             / 1000000 AS te,
           FLOOR(CASE WHEN saa - sa * sa / n > 0
                 THEN ma / SQRT((saa - sa * sa / n) / (n - 1))
                      * SQRT(CAST({IR_PERIODS} AS DOUBLE))
                 ELSE 0.0 END * 10000 + 0.5) / 10000 AS ir_annual
    FROM s WHERE n > 1 ORDER BY nation
    """,
)
def fin_information_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information ratio of each nation's monthly revenue returns
    against the global book: active return a = r_nation − r_market,
    IR = mean(a)/std(a) annualized by √{p} — 'did deviating from the
    market pay, per unit of tracking error?'. fin_revenue_beta
    measures co-movement; IR measures whether the idiosyncratic part
    carried its weight. |IR| > 0.5 is a real signal at this horizon;
    most nations should sit near 0 on synthetic data.

    Scale: two (key, month) integer-cents rollups (nation panel +
    1-row-per-month market), calendar-bounded LAG windows, one
    moments pass per nation."""
    c = cat(spark, sf_dir)
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    ).cast("bigint")
    nat = (
        c["orders"]
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                c["nation"].select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "c_nationkey",
        )
        .groupBy("nation", F.trunc("o_orderdate", "month").alias("m"))
        .agg(cents.alias("cents"))
    )
    w_n = W.partitionBy("nation").orderBy("m")
    nret = nat.select(
        "nation",
        "m",
        F.log(
            F.col("cents").cast("double")
            / F.lag("cents").over(w_n).cast("double")
        ).alias("r"),
    )
    mkt = (
        c["orders"]
        .groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(cents.alias("cents"))
    )
    w_m = W.orderBy("m")
    mret = mkt.select(
        "m",
        F.log(
            F.col("cents").cast("double")
            / F.lag("cents").over(w_m).cast("double")
        ).alias("rm"),
    )
    act = (
        nret.join(mret, "m")
        .filter(F.col("r").isNotNull() & F.col("rm").isNotNull())
        .select("nation", (F.col("r") - F.col("rm")).alias("a"))
    )
    s = act.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.avg("a").alias("ma"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum("a").alias("sa"),
        F.count(F.lit(1)).alias("n"),
    )
    var = (F.col("saa") - F.col("sa") * F.col("sa") / F.col("n")) / (
        F.col("n") - 1
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        s.filter(F.col("n") > 1)
        .select(
            "nation",
            "n_months",
            r6(F.col("ma")).alias("mean_active"),
            r6(F.sqrt(var)).alias("te"),
            rnd(
                F.when(
                    F.col("saa") - F.col("sa") * F.col("sa") / F.col("n")
                    > 0,
                    F.col("ma")
                    / F.sqrt(var)
                    * F.sqrt(F.lit(float(IR_PERIODS))),
                ).otherwise(0.0),
                4,
            ).alias("ir_annual"),
        )
        .orderBy("nation")
    )


fin_information_ratio.__doc__ = fin_information_ratio.__doc__.format(
    p=IR_PERIODS
)
