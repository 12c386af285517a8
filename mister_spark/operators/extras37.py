"""Wave 37: SRE burn-rate alerting, seasonal-naive forecast backtests,
and inverse-frequency class weights.

ev_slo_burn_rate is the Google-SRE multiwindow error-budget alert
computed in batch form; ev_snaive_backtest is the forecasting
sanity-check every anomaly threshold should be benchmarked against
(if your model can't beat 'same as last week', it isn't a model);
ml_class_weights is the one-line rebalancing input every classifier
trainer asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
SLO = 0.99  # error budget = 1 - SLO
BURN_LONG_HOURS = 6
SNAIVE_LAG_DAYS = 7


@query(
    "ev_slo_burn_rate",
    oracle=f"""
    WITH h AS (SELECT epoch_us(ts) // {HOUR_US} AS hb,
                      CAST(COUNT(*) AS BIGINT) AS n_tot,
                      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_err
               FROM events GROUP BY 1),
    w AS (SELECT hb, n_tot, n_err,
                 SUM(n_err) OVER win AS err6, SUM(n_tot) OVER win AS tot6
          FROM h
          WINDOW win AS (ORDER BY hb RANGE BETWEEN {BURN_LONG_HOURS - 1}
                         PRECEDING AND CURRENT ROW))
    SELECT CAST(hb AS BIGINT) AS hour_bucket, n_tot, n_err,
           FLOOR(CAST(n_err AS DOUBLE) / n_tot / (1 - {SLO}) * 10000 + 0.5)
             / 10000 AS burn_1h,
           FLOOR(CAST(err6 AS DOUBLE) / tot6 / (1 - {SLO}) * 10000 + 0.5)
             / 10000 AS burn_6h,
           CAST(CASE WHEN CAST(n_err AS DOUBLE) / n_tot / (1 - {SLO}) > 1
                          AND CAST(err6 AS DOUBLE) / tot6 / (1 - {SLO}) > 1
                     THEN 1 ELSE 0 END AS BIGINT) AS paging
    FROM w
    """,
)
def ev_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn rate (the SRE-workbook alert): per hour,
    the error-rate as a multiple of the {SLO:.0%} error budget over
    the 1-hour and trailing {BURN_LONG_HOURS}-hour windows, paging
    only when BOTH burn — the short window gives fast detection, the
    long one suppresses blips. Counts are exact integers; the budget
    division is the one rounded float.

    Scale: one hourly partial-agg rollup; the trailing window runs
    over the #hours grid frame (time-bounded, not event-sized — at
    multi-year spans partition it by month and carry like
    bucketed_cumsum)."""
    ev = cat(spark, sf_dir)["events"]
    h = (
        ev.select(
            F.expr(f"unix_micros(ts) div {HOUR_US}").alias("hb"),
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("hb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tot"),
            F.sum("is_err").cast("bigint").alias("n_err"),
        )
    )
    win = W.orderBy("hb").rangeBetween(-(BURN_LONG_HOURS - 1), 0)
    w = h.select(
        "hb",
        "n_tot",
        "n_err",
        F.sum("n_err").over(win).alias("err6"),
        F.sum("n_tot").over(win).alias("tot6"),
    )
    budget = 1 - SLO
    b1 = F.col("n_err").cast("double") / F.col("n_tot") / budget
    b6 = F.col("err6").cast("double") / F.col("tot6") / budget
    return w.select(
        F.col("hb").cast("bigint").alias("hour_bucket"),
        "n_tot",
        "n_err",
        ratio(b1).alias("burn_1h"),
        ratio(b6).alias("burn_6h"),
        F.when((b1 > 1) & (b6 > 1), 1).otherwise(0).cast("bigint").alias("paging"),
    )


@query(
    "ev_snaive_backtest",
    oracle=f"""
    WITH dc AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
                       CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
                FROM events GROUP BY 1, 2),
    j AS (SELECT a.event_type, a.day, a.vc,
                 b.vc AS pred
          FROM dc a JOIN dc b
            ON a.event_type = b.event_type
           AND b.day = a.day - {SNAIVE_LAG_DAYS}
          WHERE a.vc > 0)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(AVG(ABS(CAST(vc - pred AS DOUBLE)) / vc) * 10000 + 0.5)
             / 10000 AS mape,
           FLOOR(AVG(2.0 * ABS(CAST(vc - pred AS DOUBLE))
                     / (ABS(CAST(vc AS DOUBLE)) + ABS(CAST(pred AS DOUBLE))))
                 * 10000 + 0.5) / 10000 AS smape
    FROM j GROUP BY 1
    """,
)
def ev_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue
    per type as 'same as {SNAIVE_LAG_DAYS} days ago' and report MAPE /
    sMAPE — the baseline every forecasting or anomaly-threshold model
    must beat to justify existing. Daily totals are integer cents; the
    per-day error ratios are identical-formula doubles averaged over
    exact counts.

    Scale: one daily partial-agg rollup; the lag is an equi-join on
    (type, day-{SNAIVE_LAG_DAYS}) over the collapsed day frame — no
    window, no sort, and AQE broadcasts the smaller build side."""
    ev = cat(spark, sf_dir)["events"]
    dc = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
        .localCheckpoint()
    )
    b = dc.select(
        F.col("event_type").alias("event_type"),
        (F.col("day") + SNAIVE_LAG_DAYS).alias("day"),
        F.col("vc").alias("pred"),
    )
    j = dc.join(b, ["event_type", "day"]).filter(F.col("vc") > 0)
    err = F.abs((F.col("vc") - F.col("pred")).cast("double"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        ratio(F.avg(err / F.col("vc"))).alias("mape"),
        ratio(
            F.avg(
                2.0
                * err
                / (
                    F.abs(F.col("vc").cast("double"))
                    + F.abs(F.col("pred").cast("double"))
                )
            )
        ).alias("smape"),
    )


@query(
    "ml_class_weights",
    oracle="""
    WITH g AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
               FROM embeddings GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot,
                 CAST(COUNT(*) AS DOUBLE) AS k FROM g)
    SELECT g.label, g.n,
           FLOOR(g.n / t.tot * 10000 + 0.5) / 10000 AS share,
           FLOOR(t.tot / (t.k * g.n) * 10000 + 0.5) / 10000 AS weight
    FROM g, t
    """,
)
def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula:
    w = N / (k·n_class)) from the embedding labels — the rebalancing
    input every classifier trainer takes, plus the raw class shares
    for the imbalance report.

    Scale: one partial-agg rollup to #classes rows; normalizers are a
    1-row broadcast."""
    emb = cat(spark, sf_dir)["embeddings"]
    g = emb.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = g.agg(
        F.sum("n").cast("double").alias("tot"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    return g.crossJoin(F.broadcast(t)).select(
        "label",
        "n",
        ratio(F.col("n") / F.col("tot")).alias("share"),
        ratio(F.col("tot") / (F.col("k") * F.col("n"))).alias("weight"),
    )
