"""Event / time-series suite over the `events` table.

Cross-engine timestamp rule: outputs carry epoch-microsecond BIGINTs
(Spark `unix_micros` ↔ DuckDB `epoch_us`) or formatted strings — never
raw TIMESTAMP columns, whose physical precision differs between engines
(events.parquet is TIMESTAMP(NANOS); micro precision is lossless here).

Scale notes: every operator is a single shuffle on user_id (sessionize,
funnel, retention, as-of) or an equi-join on (user, time-bucket) (range
join). No inequality cross joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

GAP_US = 30 * 60 * 1_000_000  # 30-min session gap
RANGE_US = 5 * 60 * 1_000_000  # 5-min range-join band


def _ev(spark, sf_dir):
    return cat(spark, sf_dir)["events"].withColumn("tus", F.unix_micros("ts"))


@query(
    "ev_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type, COUNT(*) AS n,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total, FLOOR((AVG(value)) * 10000 + 0.5) / 10000 AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def ev_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate."""
    ev = cat(spark, sf_dir)["events"]
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("value")).alias("total"),
            ratio(F.avg("value")).alias("avg_value"),
        )
    )


@query(
    "ev_sessionize",
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS tus FROM events),
    flagged AS (
      SELECT user_id, tus,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus)
                       > 1800000000 OR
                  LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, tus,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      FROM flagged)
    SELECT user_id, sess_id, COUNT(*) AS n_events,
           MIN(tus) AS start_us, MAX(tus) AS end_us
    FROM sess GROUP BY user_id, sess_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): one shuffle on
    user_id, then lag → cumulative-sum → aggregate, all window ops over
    the same partitioning (no extra exchange)."""
    ev = _ev(spark, sf_dir).select("user_id", "tus")
    w = W.partitionBy("user_id").orderBy("tus")
    lagged = F.lag("tus").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(lagged.isNull() | (F.col("tus") - lagged > GAP_US), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tus").alias("start_us"),
        F.max("tus").alias("end_us"),
    )


@query(
    "ev_funnel",
    oracle="""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
    s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
                       OVER (PARTITION BY user_id) AS v FROM t),
    s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > v THEN tus END)
                       OVER (PARTITION BY user_id) AS c FROM s1),
    s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > c THEN tus END)
                       OVER (PARTITION BY user_id) AS p FROM s2),
    per_user AS (SELECT DISTINCT user_id, v, c, p FROM s3)
    SELECT COUNT(v) AS n_view, COUNT(c) AS n_view_click,
           COUNT(p) AS n_view_click_purchase
    FROM per_user
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (view → click → purchase), strictly
    increasing event time; single shuffle, three window passes."""
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "tus")
    w = W.partitionBy("user_id")
    s = ev.withColumn(
        "v", F.min(F.when(F.col("event_type") == "view", F.col("tus"))).over(w)
    )
    s = s.withColumn(
        "c",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("tus") > F.col("v")), F.col("tus"))
        ).over(w),
    )
    s = s.withColumn(
        "p",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("tus") > F.col("c")), F.col("tus")
            )
        ).over(w),
    )
    per_user = s.select("user_id", "v", "c", "p").distinct()
    return per_user.agg(
        F.count("v").alias("n_view"),
        F.count("c").alias("n_view_click"),
        F.count("p").alias("n_view_click_purchase"),
    )


@query(
    "ev_retention",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    cohorts AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS cohort
      FROM days)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort, day) AS INTEGER) AS offset_days,
           COUNT(*) AS n_users
    FROM cohorts GROUP BY 1, 2
    """,
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users counted per (first-seen day, day offset)."""
    ev = cat(spark, sf_dir)["events"]
    days = ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")).distinct()
    cohort = days.withColumn("cohort", F.min("day").over(W.partitionBy("user_id")))
    return (
        cohort.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("int").alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "ev_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_us, epoch_us(s.ts) AS signup_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest signup at-or-before each purchase), built as a
    union + ordered window `last(ignorenulls)` — one shuffle on user_id,
    linear scan, no inequality join. This is the 100 TB as-of pattern."""
    ev = _ev(spark, sf_dir)
    both = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "user_id",
        "tus",
        F.when(F.col("event_type") == "signup", F.col("tus")).alias("sig_us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    # signup sorts before purchase on ties so >= semantics match ASOF
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", "is_p")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    lastsig = both.withColumn("signup_us", F.last("sig_us", ignorenulls=True).over(w))
    return lastsig.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("tus").alias("purchase_us"),
        "signup_us",
    )


@query(
    "ev_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch_us(e.ts) >  epoch_us(p.ts)
     AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000
    """,
)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (errors within 5 min after a purchase, same
    user). Implemented as an equi-join on (user, time_bucket) with the
    probe side exploded to its two candidate buckets, then the exact
    band filter — expansion factor 2, never a cross join."""
    ev = _ev(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("tus").alias("p_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("p_us") / RANGE_US),
                    F.floor(F.col("p_us") / RANGE_US) + 1,
                )
            ),
        )
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("tus").alias("e_us"),
        F.floor(F.col("tus") / RANGE_US).alias("bucket"),
    )
    return (
        purchases.join(errors, ["bucket"])
        .filter(
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_us") > F.col("p_us"))
            & (F.col("e_us") <= F.col("p_us") + RANGE_US)
        )
        .select("purchase_id", "error_id")
    )


@query(
    "ev_json_extract",
    oracle="""
    SELECT event_type,
           FLOOR((AVG(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 10000 + 0.5) / 10000 AS avg_k,
           COUNT(json_extract_string(props, '$.k')) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON prop → typed column → aggregate."""
    ev = cat(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        ratio(F.avg(k)).alias("avg_k"), F.count(k).alias("n_with_k")
    )


@query(
    "ev_exact_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def ev_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cat(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


def _approx_distinct_oracle() -> str:
    from mister_spark.functions.hll import (
        HLL_R,
        hll_oracle_estimate,
        hll_oracle_registers,
    )

    reg = hll_oracle_registers("events", "event_type", "user_id")
    est = hll_oracle_estimate()
    return f"""
    WITH reg AS ({reg}),
    agg AS (SELECT event_type,
                   SUM(CAST(POWER(2, {HLL_R} - rho) AS BIGINT)) AS sp,
                   CAST(COUNT(*) AS BIGINT) AS np
            FROM reg GROUP BY 1)
    SELECT event_type,
           CAST(FLOOR({est}) AS BIGINT) AS n_users_approx
    FROM agg
    """


@query("ev_approx_distinct", oracle=_approx_distinct_oracle())
def ev_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct count — the 100 TB path where exact COUNT(DISTINCT)
    would need a full shuffle of the key universe; the register table is
    mergeable map-side O(m) state per group. Built on the PORTABLE
    md5-60 HLL (functions/hll.py) rather than the engine-local
    Datasketches `hll_sketch_agg`, so the whole sketch — registers,
    integer-grid harmonic sum, linear-counting branch — replays exactly
    in the DuckDB oracle (round-8 rows-only conversion). pytest gates
    error ≤5% vs ev_exact_distinct (~3σ at m=4096's 1.6% RSE)."""
    from mister_spark.functions.hll import (
        hll_estimate,
        hll_register_term,
        hll_registers,
    )

    ev = cat(spark, sf_dir)["events"]
    reg = hll_registers(ev, ["event_type"], "user_id")
    agg = reg.groupBy("event_type").agg(
        F.sum(hll_register_term()).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    return agg.select(
        "event_type",
        F.floor(hll_estimate(F.col("sp"), F.col("np")))
        .cast("bigint")
        .alias("n_users_approx"),
    )
