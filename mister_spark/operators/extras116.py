"""Wave 116: Chatterjee's xi correlation, runtime observability, and
attribution-window sensitivity.

stat_xicor is Chatterjee's ξ — the rank correlation that detects ANY
functional dependence, not just monotone trends (ξ→0 iff
independence, ξ→1 iff y is a measurable function of x), computed on
the two-phase ranking machinery; io_runtime_metrics snapshots the
live Spark runtime (parallelism, executor memory status, stage
counts) — the observability row a scheduled job should log with
every run; ev_attribution_window_sweep re-attributes click→purchase
conversions under 1-day/3-day/7-day windows — the sensitivity sweep
that shows how much 'conversion lift' is just window choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ATTR_WINDOWS_H = (24, 72, 168)


@query(
    "stat_xicor",
    oracle="""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS x,
                      FLOOR(SUM(value) * 100 + 0.5) / 100 AS y
               FROM events GROUP BY 1),
    o AS (SELECT y, ROW_NUMBER() OVER (ORDER BY x, user_id) AS ox FROM u),
    r AS (SELECT ox, RANK() OVER (ORDER BY y)
                       + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
          FROM o),
    adj AS (SELECT ABS(ry - LAG(ry) OVER (ORDER BY ox)) AS d FROM r),
    s AS (SELECT SUM(d) AS sd, CAST(COUNT(*) + 1 AS DOUBLE) AS n
          FROM adj WHERE d IS NOT NULL)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR((1 - 3 * sd / (n * n - 1)) * 10000 + 0.5) / 10000 AS xi
    FROM s
    """,
)
def stat_xicor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ correlation between a user's event count and
    total value: order by x, take midranks of y, then
    ξ = 1 − 3·Σ|r_{{i+1}}−r_i|/(n²−1). Unlike Pearson/Spearman, ξ
    detects ANY functional dependence (including non-monotone) and is
    asymmetric by design — the modern first look at 'is y driven by
    x at all'.

    Scale: the x-order is `global_rank` (two-phase, no single-task
    sort); y-midranks come from a second global_rank with the
    min-over-ties window; the adjacent difference joins rank i to
    i+1 — an equi-join, not a window over the whole frame."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("y"),
    )
    o = global_rank(u, "x", "user_id", rank_col="ox")
    r1 = global_rank(o.localCheckpoint(), "y", "user_id", rank_col="_ry")
    r = r1.withColumn(
        "ry",
        F.min("_ry").over(W.partitionBy("y"))
        + (F.count(F.lit(1)).over(W.partitionBy("y")) - 1) / 2.0,
    ).select("ox", "ry")
    nxt = r.select((F.col("ox") - 1).alias("ox"), F.col("ry").alias("ry_next"))
    adj = r.join(nxt, "ox").select(
        F.abs(F.col("ry_next") - F.col("ry")).alias("d")
    )
    s = adj.agg(
        F.sum("d").alias("sd"),
        (F.count(F.lit(1)) + 1).cast("double").alias("n"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        ratio(1 - 3 * F.col("sd") / (F.col("n") * F.col("n") - 1)).alias(
            "xi"
        ),
    )


@query("io_runtime_metrics")  # live-session observability → rows-only
def io_runtime_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime observability snapshot: default parallelism, shuffle
    partitions, AQE flag, active executor-memory entries, and the
    job/stage counters after running one probe aggregate — the row a
    production job logs alongside its output so a regression report
    can distinguish 'data grew' from 'cluster shrank'.

    Scale: metadata only; the probe is one count."""
    probe = cat(spark, sf_dir)["orders"].count()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    mem = sc._jsc.sc().getExecutorMemoryStatus().size()
    row = (
        int(probe),
        int(sc.defaultParallelism),
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        str(spark.conf.get("spark.sql.adaptive.enabled")),
        int(mem),
        len(tracker.getJobIdsForGroup() or []),
    )
    return spark.createDataFrame(
        [row],
        "probe_rows long, default_parallelism long, shuffle_partitions long, "
        "aqe string, executor_mem_entries long, jobs_in_group long",
    )


@query(
    "ev_attribution_window_sweep",
    oracle=f"""
    WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events),
    c AS (SELECT user_id, event_type, tus,
                 MIN(CASE WHEN event_type = 'purchase' THEN tus END)
                   OVER (PARTITION BY user_id ORDER BY tus, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase
          FROM s WHERE event_type = 'click'
             OR event_type = 'purchase'),
    clicks AS (SELECT (next_purchase - tus) / 3600000000.0 AS lag_h
               FROM c WHERE event_type = 'click'
                 AND next_purchase IS NOT NULL),
    allc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_clicks
             FROM s WHERE event_type = 'click')
    SELECT w.h AS window_hours,
           CAST(allc.n_clicks AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN clicks.lag_h <= w.h THEN 1 ELSE 0 END)
                AS BIGINT) AS attributed,
           FLOOR(SUM(CASE WHEN clicks.lag_h <= w.h THEN 1 ELSE 0 END)
                 / allc.n_clicks * 10000 + 0.5) / 10000 AS conv_rate
    FROM (VALUES {", ".join(f"({h})" for h in ATTR_WINDOWS_H)}) AS w(h),
         clicks, allc
    GROUP BY w.h, allc.n_clicks
    """,
)
def ev_attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: click→next-purchase conversion
    rates under {w}-hour windows. The sweep makes window choice an
    explicit, quantified decision instead of a default nobody
    remembers picking — if conv_rate doubles from 24h to 168h, your
    'lift' is mostly patience. (Clicks with ANY later purchase count
    once per window they fit in.)

    Scale: ONE shuffle on user_id drives the next-purchase window
    (the sessionize exchange); the sweep is a 3-row broadcast against
    the lag frame."""
    ev = cat(spark, sf_dir)["events"]
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id").rowsBetween(
        1, W.unboundedFollowing
    )
    c = s.withColumn(
        "next_purchase",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("tus"))
        ).over(w),
    ).filter(F.col("event_type") == "click")
    n_clicks = c.count()
    clicks = c.filter(F.col("next_purchase").isNotNull()).select(
        ((F.col("next_purchase") - F.col("tus")) / 3600000000.0).alias(
            "lag_h"
        )
    )
    ws = spark.createDataFrame(
        [(h,) for h in ATTR_WINDOWS_H], "h int"
    )
    return (
        clicks.crossJoin(F.broadcast(ws))
        .groupBy("h")
        .agg(
            F.lit(n_clicks).cast("bigint").alias("clicks"),
            F.sum((F.col("lag_h") <= F.col("h")).cast("long"))
            .cast("bigint")
            .alias("attributed"),
            ratio(
                F.sum((F.col("lag_h") <= F.col("h")).cast("double"))
                / F.lit(float(n_clicks))
            ).alias("conv_rate"),
        )
        .select(
            F.col("h").cast("bigint").alias("window_hours"),
            "clicks",
            "attributed",
            "conv_rate",
        )
    )


ev_attribution_window_sweep.__doc__ = (
    ev_attribution_window_sweep.__doc__.format(w=ATTR_WINDOWS_H)
)
