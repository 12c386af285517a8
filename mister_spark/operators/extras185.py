"""Wave 185: zero-inflated Poisson and capture-recapture.

stat_zip_fit fits the zero-inflated Poisson by closed-form method of
moments — the count model for 'structurally inactive' populations
where plain Poisson can't explain the zero mass — and confronts the
fitted zero share with the observed one. stat_capture_recapture is
the Chapman estimator: treat two time windows as two 'captures' of
the user population and estimate the TOTAL population (including
never-seen users) from the overlap — ecology's abundance estimator,
which product analytics reinvents whenever it asks 'how many users do
we actually have, given we only see the active ones?'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "stat_zip_fit",
    oracle="""
    WITH wk AS (SELECT o_custkey,
                       strftime(date_trunc('month', o_orderdate),
                                '%Y-%m') AS mo
                FROM orders),
    months AS (SELECT DISTINCT mo FROM wk),
    custs AS (SELECT DISTINCT o_custkey FROM wk),
    grid AS (SELECT c.o_custkey, m.mo FROM custs c, months m),
    cnt AS (SELECT g.o_custkey, g.mo,
                   CAST(COUNT(wk.o_custkey) AS DOUBLE) AS k
            FROM grid g LEFT JOIN wk
              ON g.o_custkey = wk.o_custkey AND g.mo = wk.mo
            GROUP BY 1, 2),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(k) AS m,
                 AVG(k * k) - AVG(k) * AVG(k) AS v,
                 SUM(CASE WHEN k = 0 THEN 1.0 ELSE 0.0 END)
                   / COUNT(*) AS p0
          FROM cnt),
    fit AS (SELECT n, m, v, p0,
                   (v + m * m - m) / m AS lam
            FROM s)
    SELECT CAST(n AS BIGINT) AS cells,
           FLOOR(m * 10000 + 0.5) / 10000 AS mean,
           FLOOR(v * 10000 + 0.5) / 10000 AS variance,
           FLOOR(p0 * 10000 + 0.5) / 10000 AS zero_share,
           FLOOR(lam * 10000 + 0.5) / 10000 AS lambda_hat,
           FLOOR((1 - m / lam) * 10000 + 0.5) / 10000 AS pi_hat,
           FLOOR(((1 - m / lam) + m / lam * EXP(-lam)) * 10000 + 0.5)
             / 10000 AS zero_share_fitted
    FROM fit
    """,
)
def stat_zip_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflated Poisson fit on customer-month order counts (the
    dense customer x month grid, zeros included): method-of-moments
    closed form lambda = (v + m^2 - m)/m, pi = 1 - m/lambda — the
    structural-zero share pi says how much of the zero mass is
    'inactive customers' rather than 'active but quiet'; the fitted
    zero share pi + (1-pi) e^-lambda sits next to the observed one as
    the goodness check. No iteration, no optimizer.

    Scale: the grid is customers x months (cross join of two
    DIMENSION frames — months is calendar-bounded and broadcast);
    counts are one left-join rollup; the fit is a single five-moment
    aggregate."""
    o = cat(spark, sf_dir)["orders"]
    wk = o.select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM").alias("mo")
    )
    months = wk.select("mo").distinct()
    custs = wk.select("o_custkey").distinct()
    grid = custs.crossJoin(F.broadcast(months))
    cnt = (
        grid.alias("g")
        .join(
            wk.select(
                F.col("o_custkey").alias("w_ck"), F.col("mo").alias("w_mo")
            ),
            (F.col("g.o_custkey") == F.col("w_ck"))
            & (F.col("g.mo") == F.col("w_mo")),
            "left",
        )
        .groupBy(F.col("g.o_custkey"), F.col("g.mo"))
        .agg(F.count("w_ck").cast("double").alias("k"))
    )
    s = cnt.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("k").alias("m"),
        (F.avg(F.col("k") * F.col("k")) - F.avg("k") * F.avg("k")).alias("v"),
        (
            F.sum(F.when(F.col("k") == 0, 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("p0"),
    )
    lam = (F.col("v") + F.col("m") * F.col("m") - F.col("m")) / F.col("m")
    pi = 1 - F.col("m") / lam
    return s.select(
        F.col("n").cast("bigint").alias("cells"),
        ratio(F.col("m")).alias("mean"),
        ratio(F.col("v")).alias("variance"),
        ratio(F.col("p0")).alias("zero_share"),
        ratio(lam).alias("lambda_hat"),
        ratio(pi).alias("pi_hat"),
        ratio(pi + (1 - pi) * F.exp(-lam)).alias("zero_share_fitted"),
    )


@query(
    "stat_capture_recapture",
    oracle="""
    WITH mm AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
                FROM events),
    tagged AS (SELECT DISTINCT user_id,
                      CASE WHEN epoch_us(ts) - mm.mn
                                < (mm.mx - mm.mn) / 2 THEN 1 ELSE 2 END
                        AS sample
               FROM events, mm),
    s AS (SELECT
            CAST(SUM(CASE WHEN sample = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              AS n1,
            CAST(SUM(CASE WHEN sample = 2 THEN 1 ELSE 0 END) AS DOUBLE)
              AS n2
          FROM tagged),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS recaptured
          FROM (SELECT user_id FROM tagged GROUP BY 1
                HAVING COUNT(DISTINCT sample) = 2)),
    truth AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS seen
              FROM events)
    SELECT CAST(s.n1 AS BIGINT) AS first_capture,
           CAST(s.n2 AS BIGINT) AS second_capture,
           CAST(m.recaptured AS BIGINT) AS recaptured,
           CAST(truth.seen AS BIGINT) AS distinct_seen,
           FLOOR(((s.n1 + 1) * (s.n2 + 1) / (m.recaptured + 1) - 1)
                 * 100 + 0.5) / 100 AS chapman_estimate,
           FLOOR(SQRT((s.n1 + 1) * (s.n2 + 1) * (s.n1 - m.recaptured)
                      * (s.n2 - m.recaptured)
                      / ((m.recaptured + 1) * (m.recaptured + 1)
                         * (m.recaptured + 2))) * 100 + 0.5) / 100
             AS std_error
    FROM s, m, truth
    """,
)
def stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture on the event stream: the first and
    second halves of the time range are two 'captures' of the user
    population; N_hat = (n1+1)(n2+1)/(m+1) - 1 with its closed-form
    standard error estimates the TOTAL population — including users
    the log never saw — from how often the second capture re-caught
    the first. distinct_seen rides along: N_hat above it is the
    estimator's whole point.

    Scale: two distinct-user rollups and one overlap count — three
    aggregates over one shuffle each on user_id; the midpoint is a
    1-row broadcast."""
    ev = cat(spark, sf_dir)["events"].select(
        "user_id", F.unix_micros("ts").alias("tus")
    )
    mm = ev.agg(F.min("tus").alias("mn"), F.max("tus").alias("mx"))
    tagged = (
        ev.crossJoin(F.broadcast(mm))
        .select(
            "user_id",
            F.when(
                F.col("tus") - F.col("mn") < (F.col("mx") - F.col("mn")) / 2,
                1,
            )
            .otherwise(2)
            .alias("sample"),
        )
        .distinct()
        .localCheckpoint()  # user-sample pairs; read by 2 branches
    )
    s = tagged.agg(
        F.sum(F.when(F.col("sample") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("sample") == 2, 1).otherwise(0))
        .cast("double")
        .alias("n2"),
    )
    m = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("sample").alias("k"))
        .filter(F.col("k") == 2)
        .agg(F.count(F.lit(1)).cast("double").alias("recaptured"))
    )
    truth = ev.agg(
        F.countDistinct("user_id").cast("double").alias("seen")
    )
    money2 = lambda c: F.floor(c * 100 + 0.5) / 100  # noqa: E731
    nhat = (F.col("n1") + 1) * (F.col("n2") + 1) / (
        F.col("recaptured") + 1
    ) - 1
    se = F.sqrt(
        (F.col("n1") + 1)
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("recaptured"))
        * (F.col("n2") - F.col("recaptured"))
        / (
            (F.col("recaptured") + 1)
            * (F.col("recaptured") + 1)
            * (F.col("recaptured") + 2)
        )
    )
    return (
        s.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("n1").cast("bigint").alias("first_capture"),
            F.col("n2").cast("bigint").alias("second_capture"),
            F.col("recaptured").cast("bigint").alias("recaptured"),
            F.col("seen").cast("bigint").alias("distinct_seen"),
            money2(nhat).alias("chapman_estimate"),
            money2(se).alias("std_error"),
        )
    )
