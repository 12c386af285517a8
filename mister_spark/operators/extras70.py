"""Wave 70: MR counters, resampled difference CIs, incremental file
discovery, and conformal prediction.

mr_accumulators is the Hadoop/mister job-counter idiom (side-channel
metrics from the map phase) done with Spark accumulators and PROVEN
against the declarative counts; ml_bootstrap_diff_ci extends the
Poisson bootstrap to the A/B difference (the CI people actually ship);
io_modified_after_scan pins Spark's `modifiedAfter` incremental file
discovery — poor-man's CDC for file drops; ml_conformal_interval is
split-conformal regression — distribution-free prediction intervals
with the coverage guarantee MEASURED on a held-out window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

BOOT_B = 48
BOOT_A = 1_000_003
BOOT_C = 7_919
BOOT_M = 1_000_033
CONF_ALPHA = 0.2  # 80% prediction intervals


@query(
    "mr_accumulators",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_finished,
           CAST(1 AS BIGINT) AS counters_agree
    FROM orders
    """,
)
def mr_accumulators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mister/Hadoop-style job counters: the Arrow map phase bumps
    Spark ACCUMULATORS (rows seen, big orders, finished orders) as a
    side channel, and the result row carries both the accumulator
    values and the declarative recount — counters_agree proves the
    side channel didn't lie. The production caveat is encoded in the
    design: accumulators can over-count under task retries, so the op
    forces a count() action on the SAME materialization the
    accumulators came from, exactly once.

    Scale: counters are O(1) driver state merged from executors; the
    data pass is one scan."""
    import pandas as pd

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    sc = spark.sparkContext
    acc_rows = sc.accumulator(0)
    acc_big = sc.accumulator(0)
    acc_fin = sc.accumulator(0)

    def count_batches(batches):
        for pdf in batches:
            acc_rows.add(len(pdf))
            acc_big.add(int((pdf["o_totalprice"] > 300000).sum()))
            acc_fin.add(int((pdf["o_orderstatus"] == "F").sum()))
            yield pdf[["o_orderkey"]]

    mapped = orders.mapInPandas(count_batches, schema="o_orderkey long")
    mapped.count()  # single materialization → counters final
    got = (int(acc_rows.value), int(acc_big.value), int(acc_fin.value))
    want = orders.agg(
        F.count(F.lit(1)).cast("bigint"),
        F.sum((F.col("o_totalprice") > 300000).cast("int")).cast("bigint"),
        F.sum((F.col("o_orderstatus") == "F").cast("int")).cast("bigint"),
    ).collect()[0]
    agree = int(got == (want[0], want[1], want[2]))
    return spark.createDataFrame(
        [(got[0], got[1], got[2], agree)],
        "n_rows long, n_big long, n_finished long, counters_agree long",
    )


@query(
    "ml_bootstrap_diff_ci",
    oracle=f"""
    WITH e AS (SELECT event_id, value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
               FROM events WHERE event_type IN ('click', 'view')),
    b AS (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b),
    w AS (SELECT b.b, e.g, e.value AS x,
                 CASE WHEN CAST((e.event_id * {BOOT_A} + b.b * {BOOT_C})
                               % {BOOT_M} AS DOUBLE) / {BOOT_M} < 0.36787944117144233 THEN 0
                      WHEN CAST((e.event_id * {BOOT_A} + b.b * {BOOT_C})
                               % {BOOT_M} AS DOUBLE) / {BOOT_M} < 0.7357588823428847 THEN 1
                      WHEN CAST((e.event_id * {BOOT_A} + b.b * {BOOT_C})
                               % {BOOT_M} AS DOUBLE) / {BOOT_M} < 0.9196986029286058 THEN 2
                      WHEN CAST((e.event_id * {BOOT_A} + b.b * {BOOT_C})
                               % {BOOT_M} AS DOUBLE) / {BOOT_M} < 0.9810118431238462 THEN 3
                      WHEN CAST((e.event_id * {BOOT_A} + b.b * {BOOT_C})
                               % {BOOT_M} AS DOUBLE) / {BOOT_M} < 0.9963401531726563 THEN 4
                      ELSE 5 END AS w
          FROM e CROSS JOIN b),
    m AS (SELECT b,
                 SUM(w * x * g) / NULLIF(SUM(CAST(w AS DOUBLE) * g), 0)
                 - SUM(w * x * (1 - g))
                   / NULLIF(SUM(CAST(w AS DOUBLE) * (1 - g)), 0) AS db
          FROM w GROUP BY b),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nb, SUM(db) AS sm,
                 SUM(db * db) AS smm
          FROM m WHERE db IS NOT NULL),
    p AS (SELECT AVG(CASE WHEN g = 1 THEN value END)
                 - AVG(CASE WHEN g = 0 THEN value END) AS d FROM e)
    SELECT FLOOR(p.d * 10000 + 0.5) / 10000 AS diff,
           FLOOR(sqrt((s.smm - s.sm * s.sm / s.nb) / (s.nb - 1))
                 * 10000 + 0.5) / 10000 AS boot_se,
           FLOOR((s.sm / s.nb - 1.96 * sqrt((s.smm - s.sm * s.sm / s.nb)
                                            / (s.nb - 1)))
                 * 10000 + 0.5) / 10000 AS ci_lo,
           FLOOR((s.sm / s.nb + 1.96 * sqrt((s.smm - s.sm * s.sm / s.nb)
                                            / (s.nb - 1)))
                 * 10000 + 0.5) / 10000 AS ci_hi
    FROM s CROSS JOIN p
    """,
)
def ml_bootstrap_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for the click-minus-view mean difference:
    the same deterministic hash-drawn replicate weights as
    ml_bootstrap_ci, applied to BOTH groups inside each replicate so
    the difference's sampling distribution is resampled jointly — the
    CI an experiment readout actually ships (a mean's CI is not a
    difference's CI).

    Scale: one {b}-group aggregation over the weighted expansion,
    map-side combined; O({b}) result."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "view")
    )
    e = ev.select(
        "event_id",
        F.col("value").alias("x"),
        (F.col("event_type") == "click").cast("int").alias("g"),
    )
    b = spark.range(BOOT_B).select(F.col("id").alias("b"))
    u = (
        (F.col("event_id") * BOOT_A + F.col("b") * BOOT_C) % BOOT_M
    ).cast("double") / BOOT_M
    thresholds = (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
    )
    w = F.lit(5)
    for k in reversed(range(len(thresholds))):
        w = F.when(u < thresholds[k], F.lit(k)).otherwise(w)
    wdf = e.join(F.broadcast(b)).select(
        "b", "x", "g", w.cast("double").alias("w")
    )
    g, x, wc = F.col("g"), F.col("x"), F.col("w")
    m = wdf.groupBy("b").agg(
        (
            F.sum(wc * x * g) / F.nullif(F.sum(wc * g), F.lit(0.0))
            - F.sum(wc * x * (1 - g)) / F.nullif(F.sum(wc * (1 - g)), F.lit(0.0))
        ).alias("db")
    ).filter(F.col("db").isNotNull())
    s = m.agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.sum("db").alias("sm"),
        F.sum(F.col("db") * F.col("db")).alias("smm"),
    )
    p = e.agg(
        (
            F.avg(F.when(g == 1, x)) - F.avg(F.when(g == 0, x))
        ).alias("d")
    )
    se = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    ctr = F.col("sm") / F.col("nb")
    return s.join(F.broadcast(p)).select(
        ratio(F.col("d")).alias("diff"),
        ratio(se).alias("boot_se"),
        ratio(ctr - 1.96 * se).alias("ci_lo"),
        ratio(ctr + 1.96 * se).alias("ci_hi"),
    )


ml_bootstrap_diff_ci.__doc__ = ml_bootstrap_diff_ci.__doc__.format(b=BOOT_B)


@query(
    "io_modified_after_scan",
    # Real oracle: the two file drops split orders by key parity, so
    # the mtime-filtered read must see exactly the odd half.
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS evens,
                      CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS odds
               FROM orders)
    SELECT n AS n_total, odds AS n_after_cutoff,
           evens AS n_old, CAST(1 AS BIGINT) AS skipped_old
    FROM c
    """,
)
def io_modified_after_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental file discovery with `modifiedAfter`: stage two file
    drops with distinct mtimes, then read with the cutoff between them
    — Spark's reader must see ONLY the second drop. This is the
    zero-infrastructure incremental-ingest pattern (file-drop CDC)
    before a real table format enters the picture.

    Scale: discovery is a listing-time filter — no data read for
    excluded files."""
    import os
    import time
    import uuid

    from mister_spark.sources.staged import REPO_TMP

    orders = cat(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    base = os.path.join(REPO_TMP, f"modafter_{uuid.uuid4().hex[:8]}")
    old = orders.filter(F.col("o_orderkey") % 2 == 0)
    new = orders.filter(F.col("o_orderkey") % 2 == 1)
    old.write.mode("overwrite").parquet(base)
    # pin distinct mtimes without sleeping: backdate the first drop
    past = time.time() - 3600
    for f in os.listdir(base):
        os.utime(os.path.join(base, f), (past, past))
    cutoff_ts = time.strftime(
        "%Y-%m-%dT%H:%M:%S", time.gmtime(past + 1800)
    )
    new.write.mode("append").parquet(base)
    n_all = spark.read.parquet(base).count()
    n_new = (
        spark.read.option("modifiedAfter", cutoff_ts).parquet(base).count()
    )
    n_old = old.count()
    return spark.createDataFrame(
        [
            (
                int(n_all),
                int(n_new),
                int(n_old),
                int(n_all - n_new == n_old),
            )
        ],
        "n_total long, n_after_cutoff long, n_old long, skipped_old long",
    )


@query(
    "ml_conformal_interval",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', o_orderdate) AS DATE))
                        AS t,
                      SUM(o_totalprice) AS y
               FROM orders GROUP BY 1),
    i AS (SELECT t, y, ROW_NUMBER() OVER (ORDER BY t) - 1 AS idx,
                 COUNT(*) OVER () AS n
          FROM d),
    part AS (SELECT t, y, idx,
                    CASE WHEN idx * 2 < n THEN 'train'
                         WHEN idx * 4 < n * 3 THEN 'calib'
                         ELSE 'test' END AS split
             FROM i),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(t) AS sx, SUM(y) AS sy,
                 SUM(CAST(t AS DOUBLE) * t) AS sxx, SUM(t * y) AS sxy
          FROM part WHERE split = 'train'),
    f AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                 (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a
          FROM s),
    resid AS (SELECT ABS(p.y - (f.a + f.b * p.t)) AS r
              FROM part p CROSS JOIN f WHERE p.split = 'calib'),
    rk AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
                  COUNT(*) OVER () AS m
           FROM resid),
    q AS (SELECT MIN(r) AS qhat FROM rk
          WHERE rn >= CEIL((m + 1) * (1 - {CONF_ALPHA}))),
    cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN ABS(p.y - (f.a + f.b * p.t)) <= q.qhat
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
            FROM part p CROSS JOIN f CROSS JOIN q WHERE p.split = 'test')
    SELECT cov.n_test, cov.n_covered,
           FLOOR(q.qhat * 100 + 0.5) / 100 AS qhat,
           FLOOR(CAST(cov.n_covered AS DOUBLE) / cov.n_test * 10000 + 0.5)
             / 10000 AS coverage
    FROM cov CROSS JOIN q
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for the daily-revenue
    trend: fit OLS on the first half, take the ⌈(m+1)(1−α)⌉-th
    absolute calibration residual as the interval half-width q̂
    (α={a} → 80% target), and MEASURE coverage on the final quarter —
    the distribution-free guarantee, checked rather than cited.

    Scale: day-grid frames throughout; the calibration quantile is an
    order statistic on a calendar-bounded frame (at data-sized
    calibration sets, swap in the two-phase global_rank)."""
    from pyspark.sql import Window as W

    orders = cat(spark, sf_dir)["orders"]
    d = orders.groupBy(
        F.datediff(F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01"))
        .alias("t")
    ).agg(F.sum("o_totalprice").alias("y"))
    i = d.select(
        "t",
        "y",
        (F.row_number().over(W.orderBy("t")) - 1).alias("idx"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    part = i.select(
        "t",
        "y",
        F.when(F.col("idx") * 2 < F.col("n"), "train")
        .when(F.col("idx") * 4 < F.col("n") * 3, "calib")
        .otherwise("test")
        .alias("split"),
    ).localCheckpoint()
    t, y = F.col("t").cast("double"), F.col("y")
    s = part.filter(F.col("split") == "train").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(t).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(t * t).alias("sxx"),
        F.sum(t * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    bb = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    f = s.select(bb.alias("b"), ((sy - bb * sx) / n).alias("a"))
    resid = (
        part.filter(F.col("split") == "calib")
        .join(F.broadcast(f))
        .select(F.abs(y - (F.col("a") + F.col("b") * t)).alias("r"))
    )
    rk = resid.select(
        "r",
        F.row_number().over(W.orderBy("r")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    q = rk.filter(
        F.col("rn") >= F.ceil((F.col("m") + 1) * (1 - CONF_ALPHA))
    ).agg(F.min("r").alias("qhat"))
    cov = (
        part.filter(F.col("split") == "test")
        .join(F.broadcast(f))
        .join(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (
                    F.abs(y - (F.col("a") + F.col("b") * t)) <= F.col("qhat")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_covered"),
            F.max("qhat").alias("qhat"),
        )
    )
    return cov.select(
        "n_test",
        "n_covered",
        money(F.col("qhat")).alias("qhat"),
        ratio(F.col("n_covered").cast("double") / F.col("n_test")).alias(
            "coverage"
        ),
    )


ml_conformal_interval.__doc__ = ml_conformal_interval.__doc__.format(
    a=CONF_ALPHA
)
