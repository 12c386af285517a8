"""Wave 75: regression discontinuity, checkpoint-resume semantics, and
capacity planning.

stat_regression_discontinuity runs the sharp-RDD local-linear contrast
at a known cutoff — on this synthetic data the true effect is zero,
and MEASURING a tight null is the honest demonstration;
stream_checkpoint_resume pins Structured Streaming's exactly-once
resume contract (a second availableNow run from the same checkpoint
reprocesses nothing); ev_capacity_plan turns hourly concurrency into
the provisioning numbers an SRE actually files (p95/p99-of-peak plus
headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

RDD_CUTOFF = 300000.0  # forcing variable: o_totalprice
RDD_BANDWIDTH = 150000.0
CAP_HEADROOM = 1.3


@query(
    "stat_regression_discontinuity",
    oracle=f"""
    WITH o AS (SELECT o_totalprice AS x,
                      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1.0 ELSE 0.0 END AS y
               FROM orders
               WHERE o_totalprice BETWEEN {RDD_CUTOFF - RDD_BANDWIDTH}
                     AND {RDD_CUTOFF + RDD_BANDWIDTH}),
    s AS (SELECT CASE WHEN x >= {RDD_CUTOFF} THEN 1 ELSE 0 END AS side,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
                 SUM(x * y) AS sxy
          FROM o GROUP BY 1),
    f AS (SELECT side, n,
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                 (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a
          FROM s),
    w AS (SELECT MAX(CASE WHEN side = 0 THEN a + b * {RDD_CUTOFF} END)
                   AS y_left,
                 MAX(CASE WHEN side = 1 THEN a + b * {RDD_CUTOFF} END)
                   AS y_right,
                 CAST(MAX(CASE WHEN side = 0 THEN n END) AS BIGINT)
                   AS n_left,
                 CAST(MAX(CASE WHEN side = 1 THEN n END) AS BIGINT)
                   AS n_right
          FROM f)
    SELECT n_left, n_right,
           FLOOR(y_left * 10000 + 0.5) / 10000 AS y_left,
           FLOOR(y_right * 10000 + 0.5) / 10000 AS y_right,
           FLOOR((y_right - y_left) * 10000 + 0.5) / 10000 AS rdd_effect
    FROM w
    """,
)
def stat_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at totalprice = {c}: local linear
    fits on each side within ±{h}, both evaluated AT the cutoff; the
    jump is the causal effect of 'crossing the threshold' on the
    high-priority share. The synthetic data has NO such rule, so the
    honest result is a tight null — which is exactly what the method
    should report when nothing is there (placebo-test discipline).

    Scale: one banded scan → two sufficient-statistics rows."""
    orders = cat(spark, sf_dir)["orders"].filter(
        F.col("o_totalprice").between(
            RDD_CUTOFF - RDD_BANDWIDTH, RDD_CUTOFF + RDD_BANDWIDTH
        )
    )
    o = orders.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("double")
        .alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    s = o.groupBy(
        (x >= RDD_CUTOFF).cast("int").alias("side")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    f = s.select(
        "side", n.alias("n"), b.alias("b"), ((sy - b * sx) / n).alias("a")
    )
    at_cut = F.col("a") + F.col("b") * RDD_CUTOFF
    w = f.agg(
        F.max(F.when(F.col("side") == 0, at_cut)).alias("y_left"),
        F.max(F.when(F.col("side") == 1, at_cut)).alias("y_right"),
        F.max(F.when(F.col("side") == 0, F.col("n"))).cast("bigint").alias(
            "n_left"
        ),
        F.max(F.when(F.col("side") == 1, F.col("n"))).cast("bigint").alias(
            "n_right"
        ),
    )
    return w.select(
        "n_left",
        "n_right",
        ratio(F.col("y_left")).alias("y_left"),
        ratio(F.col("y_right")).alias("y_right"),
        ratio(F.col("y_right") - F.col("y_left")).alias("rdd_effect"),
    )


stat_regression_discontinuity.__doc__ = (
    stat_regression_discontinuity.__doc__.format(c=RDD_CUTOFF, h=RDD_BANDWIDTH)
)


@query("stream_checkpoint_resume")  # streaming resume semantics →
# rows-only; pytest pins the second-run-is-a-no-op contract.
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once resume, pinned: run the tumbling aggregation with
    availableNow against a SHARED checkpoint twice — the first run
    processes the whole input, the second finds the source offsets
    already committed and processes ZERO rows. This is the property
    that makes nightly restarts safe; losing the checkpoint (or
    changing the query shape) is what breaks it, and this op is the
    regression trap for that.

    Scale: checkpoint state is O(offsets + operator state), not data."""
    import json
    import os
    import uuid

    from mister_spark.sources.staged import REPO_TMP
    from mister_spark.streaming.jobs import _read_events_stream

    name = f"ckres_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO_TMP, "ckpt", name)

    def run_once(tag: str) -> int:
        ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
        agg = ev.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName(f"{name}_{tag}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = 0
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            rows += int(d.get("numInputRows") or 0)
        return rows

    first = run_once("a")
    second = run_once("b")
    n_events = cat(spark, sf_dir)["events"].count()
    return spark.createDataFrame(
        [
            (
                int(first),
                int(second),
                int(n_events),
                int(first == n_events and second == 0),
            )
        ],
        "first_run_rows long, second_run_rows long, n_events long, "
        "exactly_once long",
    )


@query(
    "ev_capacity_plan",
    oracle=f"""
    WITH h AS (SELECT date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, hr) AS rn,
                 COUNT(*) OVER () AS m
          FROM h),
    q AS (SELECT MAX(CASE WHEN rn * 100 >= m * 50 AND prev * 100 < m * 50
                      THEN n END) AS p50,
                 MAX(CASE WHEN rn * 100 >= m * 95 AND prev * 100 < m * 95
                      THEN n END) AS p95,
                 MAX(CASE WHEN rn * 100 >= m * 99 AND prev * 100 < m * 99
                      THEN n END) AS p99,
                 MAX(n) AS peak,
                 CAST(MAX(m) AS BIGINT) AS n_hours
          FROM (SELECT n, rn, m,
                       COALESCE(LAG(rn) OVER (ORDER BY rn), 0) AS prev
                FROM r))
    SELECT n_hours, CAST(p50 AS BIGINT) AS p50, CAST(p95 AS BIGINT) AS p95,
           CAST(p99 AS BIGINT) AS p99, CAST(peak AS BIGINT) AS peak,
           CAST(CEIL(p99 * {CAP_HEADROOM}) AS BIGINT) AS provision_for
    FROM q
    """,
)
def ev_capacity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity planning from hourly event concurrency: exact p50/p95/
    p99 of hourly volume (rank-based order statistics, deterministic
    tiebreaks) plus the peak, and the provisioning recommendation
    p99 × {h} headroom — the numbers an SRE capacity review actually
    files, from one hourly rollup.

    Scale: hours are calendar-bounded; the rank pass is a bounded
    window (at years of hours, the two-phase global_rank applies)."""
    ev = cat(spark, sf_dir)["events"]
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    r = h.select(
        "n",
        F.row_number().over(W.orderBy("n", "hr")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    ).withColumn(
        "prev", F.coalesce(F.lag("rn").over(W.orderBy("rn")), F.lit(0))
    )
    def pct(p: int):
        return F.max(
            F.when(
                (F.col("rn") * 100 >= F.col("m") * p)
                & (F.col("prev") * 100 < F.col("m") * p),
                F.col("n"),
            )
        )

    q = r.agg(
        pct(50).alias("p50"),
        pct(95).alias("p95"),
        pct(99).alias("p99"),
        F.max("n").alias("peak"),
        F.max("m").cast("bigint").alias("n_hours"),
    )
    return q.select(
        "n_hours",
        F.col("p50").cast("bigint").alias("p50"),
        F.col("p95").cast("bigint").alias("p95"),
        F.col("p99").cast("bigint").alias("p99"),
        F.col("peak").cast("bigint").alias("peak"),
        F.ceil(F.col("p99") * CAP_HEADROOM).cast("bigint").alias(
            "provision_for"
        ),
    )


ev_capacity_plan.__doc__ = ev_capacity_plan.__doc__.format(h=CAP_HEADROOM)
