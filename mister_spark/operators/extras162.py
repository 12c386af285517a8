"""Wave 162: DAU/MAU stickiness and the Chauvenet outlier criterion.

ev_stickiness is the product-analytics staple — per month, how many
of the month's actives show up on an average day — the engagement
ratio every growth dashboard leads with; stat_chauvenet flags days
whose revenue z-score is improbable given the SAMPLE SIZE (expected
count of such extremes < 0.5), the classical sample-size-aware
alternative to a fixed 3-sigma rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "ev_stickiness",
    oracle="""
    WITH d AS (SELECT strftime(date_trunc('month', ts), '%Y-%m') AS mon,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      user_id
               FROM events),
    dau AS (SELECT mon, day, CAST(COUNT(DISTINCT user_id) AS DOUBLE)
                     AS dau
            FROM d GROUP BY 1, 2),
    mau AS (SELECT mon, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS mau
            FROM d GROUP BY 1),
    j AS (SELECT dau.mon, dau.dau, mau.mau FROM dau
          JOIN mau ON dau.mon = mau.mon)
    SELECT mon AS month,
           CAST(MAX(mau) AS BIGINT) AS mau,
           FLOOR(AVG(dau) * 100 + 0.5) / 100 AS avg_dau,
           FLOOR(AVG(dau / mau) * 10000 + 0.5) / 10000 AS stickiness
    FROM j GROUP BY 1
    """,
)
def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness by month: distinct daily actives over
    distinct monthly actives, averaged across the month's days —
    the share of the monthly audience that shows up on a typical
    day. Both distinct counts come from ONE pass over (month, day,
    user) — the MAU is not a separate scan.

    Scale: two distinct-aggregates sharing a shuffle on bounded
    calendar keys; the join back is |months| rows, broadcast."""
    d = cat(spark, sf_dir)["events"].select(
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias(
            "mon"
        ),
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    )
    dau = d.groupBy("mon", "day").agg(
        F.countDistinct("user_id").cast("double").alias("dau")
    )
    mau = d.groupBy("mon").agg(
        F.countDistinct("user_id").cast("double").alias("mau")
    )
    j = dau.join(F.broadcast(mau), "mon")
    return j.groupBy(F.col("mon").alias("month")).agg(
        F.max("mau").cast("bigint").alias("mau"),
        (F.floor(F.avg("dau") * 100 + 0.5) / 100).alias("avg_dau"),
        ratio(F.avg(F.col("dau") / F.col("mau"))).alias("stickiness"),
    )


@query(
    "stat_chauvenet",
    oracle=f"""
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      SUM(CASE WHEN event_type = 'purchase'
                               THEN value ELSE 0 END) AS rev
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(rev) AS mu,
                 STDDEV_POP(rev) AS sd
          FROM d),
    z AS (SELECT d.day, ABS(d.rev - m.mu) / m.sd AS az, m.n
          FROM d, m),
    fl AS (SELECT day, az,
                  2 * n * ({normal_sf_sql("az")}) AS expected_extremes
           FROM z)
    SELECT CAST(COUNT(*) AS BIGINT) AS days,
           CAST(SUM(CASE WHEN expected_extremes < 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS outlier_days,
           FLOOR(MAX(az) * 10000 + 0.5) / 10000 AS max_abs_z,
           FLOOR(MIN(expected_extremes) * 10000 + 0.5) / 10000
             AS min_expected
    FROM fl
    """,
)
def stat_chauvenet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chauvenet's criterion on daily revenue: a day is an outlier
    when the EXPECTED number of equally-extreme days — 2·n·Φ̄(|z|)
    — falls below one half. Unlike a fixed 3-sigma fence, the
    threshold tightens as the series grows, which is the whole
    point: with 3000 days a 3-sigma day is expected, not anomalous.
    Engine-shared erf approximation keeps both sides bit-identical.

    Scale: day-level series after one rollup; moments and flags are
    two tiny-frame passes."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("rev")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("rev").alias("mu"),
        F.stddev_pop("rev").alias("sd"),
    )
    z = d.crossJoin(F.broadcast(m)).select(
        "day",
        (F.abs(F.col("rev") - F.col("mu")) / F.col("sd")).alias("az"),
        "n",
    )
    fl = z.select(
        "day",
        "az",
        (2 * F.col("n") * normal_sf(F.col("az"))).alias(
            "expected_extremes"
        ),
    )
    return fl.agg(
        F.count(F.lit(1)).cast("bigint").alias("days"),
        F.sum(
            F.when(F.col("expected_extremes") < 0.5, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("outlier_days"),
        ratio(F.max("az")).alias("max_abs_z"),
        ratio(F.min("expected_extremes")).alias("min_expected"),
    )
