"""Wave 21: Holt double-exponential smoothing as a recursive CTE,
seasonal-baseline anomalies, and Q-Q distribution comparison.

Holt smoothing is inherently recursive (level/trend at day d depend on
day d−1) — no window frame can express it. Spark 4's WITH RECURSIVE
runs the identical query string DuckDB runs, with every iterate rounded
to 6 dp inside the recursion so float drift cannot compound across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

# Holt parameters as exact binary fractions (0.5, 0.25): the products
# are exactly representable, keeping the recursion drift-free even
# before rounding
HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         FLOOR(SUM(value) * 100 + 0.5) / 100 AS x
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
),
holt(event_type, day, lvl, trend) AS (
  SELECT d.event_type, d.day, d.x, CAST(0.0 AS DOUBLE)
  FROM daily d JOIN bounds b
    ON d.event_type = b.event_type AND d.day = b.d0
  UNION ALL
  SELECT h.event_type, d.day,
         FLOOR((0.5 * d.x + 0.5 * (h.lvl + h.trend)) * 1000000 + 0.5) / 1000000,
         FLOOR((0.25 * (FLOOR((0.5 * d.x + 0.5 * (h.lvl + h.trend))
                               * 1000000 + 0.5) / 1000000 - h.lvl)
                + 0.75 * h.trend) * 1000000 + 0.5) / 1000000
  FROM holt h
  JOIN daily d ON d.event_type = h.event_type AND d.day = h.day + 1
)
SELECT event_type, day,
       FLOOR(lvl * 10000 + 0.5) / 10000 AS level,
       FLOOR(trend * 10000 + 0.5) / 10000 AS trend
FROM holt
"""

# epoch_us is DuckDB-only; the Spark twin string swaps in unix_micros
HOLT_SQL_SPARK = HOLT_SQL.replace("epoch_us(ts) //", "unix_micros(ts) div")


@query("ev_holt_smoothing", oracle=HOLT_SQL)
def ev_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (α=0.5, β=0.25) of daily
    totals per event type, written as a recursive CTE: level and trend
    at each day feed the next day's update, the recurrence no window
    frame can express. The same SQL (modulo the epoch-micros function
    name) runs on both engines; every iterate is rounded to 6 dp inside
    the recursion and α/β are exact binary fractions, so the chained
    floats are bit-identical cross-engine.

    Scale: the anchor is the daily rollup (one data-sized shuffle);
    each recursive step touches ≤ |types| rows and depth is bounded by
    the calendar. Spark 4 executes the recursion iteratively with the
    same semantics as DuckDB."""
    cat(spark, sf_dir).register_views()
    return spark.sql(HOLT_SQL_SPARK)


@query(
    "ev_anomaly_seasonal",
    oracle="""
    WITH k AS (
      SELECT event_type, date_part('hour', ts) AS hod, value,
             epoch_us(ts) AS tus
      FROM events),
    base AS (
      SELECT event_type, hod, AVG(value) AS mu,
             COUNT(*) AS n, SUM(value * value) AS s2, SUM(value) AS s
      FROM k GROUP BY 1, 2),
    scored AS (
      SELECT k.event_type, k.hod,
             CASE WHEN (base.s2 - base.s * base.s / base.n) / base.n > 0
                  THEN FLOOR(ABS(k.value - base.mu)
                       / SQRT((base.s2 - base.s * base.s / base.n) / base.n)
                       * 10000 + 0.5) / 10000
                  ELSE 0.0 END AS z
      FROM k JOIN base ON k.event_type = base.event_type AND k.hod = base.hod)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN z > 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_seasonal_outliers
    FROM scored GROUP BY 1
    """,
)
def ev_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly counts: each event is z-scored
    against the mean/std of ITS OWN (type, hour-of-day) cell, so a
    midnight spike isn't excused by the daily average — the adjustment
    ev_zscore (global) and ev_anomaly_mad (global-robust) don't make.

    Scale: the baseline is a |types|×24 frame from one partial-agg
    shuffle, broadcast back over the stream — same two-pass shape as
    the other anomaly ops, keyed one level finer."""
    ev = cat(spark, sf_dir)["events"]
    k = ev.select("event_type", F.hour("ts").alias("hod"), "value")
    base = k.groupBy("event_type", "hod").agg(
        F.avg("value").alias("mu"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.sum("value").alias("s"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    scored = k.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_type",
        F.when(
            var > 0,
            rnd(F.abs(F.col("value") - F.col("mu")) / F.sqrt(var), 4),
        )
        .otherwise(0.0)
        .alias("z"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("z") > 3, 1).otherwise(0))
        .cast("long")
        .alias("n_seasonal_outliers"),
    )


QQ_POINTS = 9  # deciles 10%..90%


@query(
    "stat_qq",
    oracle=f"""
    WITH qp AS (
      SELECT quantile_cont(value, [{", ".join(str(i / 10.0) for i in range(1, QQ_POINTS + 1))}]) AS l
      FROM events WHERE event_type = 'purchase'),
    qe AS (
      SELECT quantile_cont(value, [{", ".join(str(i / 10.0) for i in range(1, QQ_POINTS + 1))}]) AS l
      FROM events WHERE event_type = 'error'),
    q AS (SELECT unnest(generate_series(1, {QQ_POINTS})) AS i)
    SELECT CAST(q.i AS BIGINT) AS i,
           FLOOR(q.i / 10.0 * 100 + 0.5) / 100 AS pct,
           FLOOR(qp.l[q.i] * 10000 + 0.5) / 10000 AS q_purchase,
           FLOOR(qe.l[q.i] * 10000 + 0.5) / 10000 AS q_error,
           FLOOR((qp.l[q.i] - qe.l[q.i]) * 10000 + 0.5) / 10000 AS gap
    FROM q, qp, qe
    """,
)
def stat_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q comparison points: purchase vs error value distributions
    compared decile by decile (the plot behind 'are these two
    distributions shaped alike, and where do they diverge') — the
    visual companion to stat_ks_test's single statistic.

    Scale: one percentile aggregate per side computing all nine
    quantiles in a single pass (percentile(value, array(...)) — not
    nine scans), exploded against a 9-row literal frame."""
    ev = cat(spark, sf_dir)["events"]
    pcts = [i / 10.0 for i in range(1, QQ_POINTS + 1)]
    arr = ", ".join(str(p) for p in pcts)
    agg = ev.groupBy().agg(
        F.expr(
            f"percentile(CASE WHEN event_type = 'purchase' THEN value END, array({arr}))"
        ).alias("qp"),
        F.expr(
            f"percentile(CASE WHEN event_type = 'error' THEN value END, array({arr}))"
        ).alias("qe"),
    )
    idx = spark.createDataFrame([(i,) for i in range(1, QQ_POINTS + 1)], "i long")
    j = idx.join(F.broadcast(agg))
    qp = F.element_at("qp", F.col("i").cast("int"))
    qe = F.element_at("qe", F.col("i").cast("int"))
    return j.select(
        "i",
        rnd(F.col("i") / 10.0, 2).alias("pct"),
        ratio(qp).alias("q_purchase"),
        ratio(qe).alias("q_error"),
        ratio(qp - qe).alias("gap"),
    )
