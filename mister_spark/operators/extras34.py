"""Wave 34: session-duration percentiles, alert throttling, and the
ROWS-vs-RANGE window frame semantics key.

ev_session_stats turns sessionization into the latency-style
percentile summary capacity planning reads; ev_alert_throttle is the
cooldown suppression every alerting pipeline needs — a genuinely
sequential per-key recursion (state depends on the last EMITTED row,
not the last row), shipped as an ordered applyInPandas because no
window can express it; w_rows_vs_range pins the default-frame footgun
(RANGE aggregates date peers together, ROWS doesn't) as a checked
contract rather than a code-review comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

ALERT_COOLDOWN_US = 3600_000_000  # suppress repeat alerts within 1 h


@query(
    "ev_session_stats",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    l AS (SELECT user_id, tus,
                 LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
          FROM e),
    f AS (SELECT user_id, tus,
                 CASE WHEN prev IS NULL OR tus - prev > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM l),
    s AS (SELECT user_id, tus,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM f),
    d AS (SELECT user_id, sess_id, MAX(tus) - MIN(tus) AS dur,
                 CAST(COUNT(*) AS BIGINT) AS n_ev
          FROM s GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           FLOOR(CAST(SUM(dur) AS DOUBLE) / COUNT(*) / 1000000 * 10000 + 0.5)
             / 10000 AS mean_s,
           FLOOR(quantile_cont(dur, 0.5) / 1000000 * 10000 + 0.5) / 10000
             AS p50_s,
           FLOOR(quantile_cont(dur, 0.9) / 1000000 * 10000 + 0.5) / 10000
             AS p90_s,
           FLOOR(quantile_cont(dur, 0.99) / 1000000 * 10000 + 0.5) / 10000
             AS p99_s
    FROM d
    """,
)
def ev_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution summary (count, mean, exact
    p50/p90/p99 in seconds) over 30-minute-gap sessions — the
    latency-percentile-style capacity number session infrastructure is
    sized by. Durations are integer microseconds, so the mean is an
    exact integer division and the percentiles interpolate identical
    ints on both engines (Spark `percentile` ↔ DuckDB quantile_cont).

    Scale: sessionization is the one user-partitioned window pass; the
    percentile runs on the collapsed per-session frame (sessions ≪
    events). At extreme session counts the documented swap is
    approx_percentile — same plan, sketch aggregate."""
    from mister_spark.operators.events import GAP_US, _ev

    ev = _ev(spark, sf_dir).select("user_id", "tus")
    w = W.partitionBy("user_id").orderBy("tus")
    lagged = F.lag("tus").over(w)
    d = (
        ev.withColumn(
            "new_sess",
            F.when(lagged.isNull() | (F.col("tus") - lagged > GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess_id")
        .agg((F.max("tus") - F.min("tus")).alias("dur"))
    )
    pct = F.expr("percentile(dur, array(0.5, 0.9, 0.99))")
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("dur").alias("sumdur"),
        pct.alias("ps"),
    )
    return s.select(
        "n_sessions",
        rnd(F.col("sumdur").cast("double") / F.col("n_sessions") / 1e6, 4).alias(
            "mean_s"
        ),
        rnd(F.col("ps")[0] / 1e6, 4).alias("p50_s"),
        rnd(F.col("ps")[1] / 1e6, 4).alias("p90_s"),
        rnd(F.col("ps")[2] / 1e6, 4).alias("p99_s"),
    )


@query(
    "ev_alert_throttle",
    # Real oracle: the emitted-row-dependent fold runs as a recursive
    # CTE advancing every user's (fired, last, first) state one error
    # at a time along the per-user event index — the SQL twin of the
    # applyInPandas fold. Integer microsecond state, zero float risk.
    oracle=f"""
    WITH RECURSIVE err AS (
      SELECT user_id, epoch_us(ts) AS tus,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts)) AS i
      FROM events WHERE event_type = 'error'
    ),
    th AS (
      SELECT user_id, 1 AS pos, 1 AS fired, tus AS last, tus AS first
      FROM err WHERE i = 1
      UNION ALL
      SELECT t.user_id, t.pos + 1,
             CASE WHEN e.tus - t.last > {ALERT_COOLDOWN_US}
                  THEN t.fired + 1 ELSE t.fired END,
             CASE WHEN e.tus - t.last > {ALERT_COOLDOWN_US}
                  THEN e.tus ELSE t.last END,
             t.first
      FROM th t JOIN err e ON e.user_id = t.user_id AND e.i = t.pos + 1
    ),
    fin AS (SELECT user_id, MAX(i) AS mi, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM err GROUP BY 1)
    SELECT t.user_id, f.cnt AS n_errors,
           CAST(t.fired AS BIGINT) AS n_alerts,
           t.first AS first_alert_us, t.last AS last_alert_us
    FROM th t JOIN fin f ON f.user_id = t.user_id AND t.pos = f.mi
    """,
)
def ev_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert cooldown suppression: per user, an 'error' event fires an
    alert only if the PREVIOUS FIRED alert is more than 1 hour old
    (first always fires). The recursion depends on the last EMITTED
    row, not the last input row — no window frame can express it, so
    it runs as an ordered per-user fold inside applyInPandas (Arrow
    batches, one group = one user's errors). Returns per-user alert
    accounting; pytest replays a pure-Python reference fold.

    Scale: one shuffle on user_id; per-group state is two integers and
    groups are user-sized. This is the batch twin of the
    applyInPandasWithState streaming quota pattern (stream_quota)."""
    import pandas as pd

    ev = cat(spark, sf_dir)["events"]
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.expr("unix_micros(ts)").alias("tus")
    )

    def throttle(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("tus")
        fired = 0
        last = None
        first_alert = None
        for t in pdf["tus"]:
            if last is None or t - last > ALERT_COOLDOWN_US:
                fired += 1
                last = int(t)
                if first_alert is None:
                    first_alert = int(t)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_errors": [len(pdf)],
                "n_alerts": [fired],
                "first_alert_us": [first_alert],
                "last_alert_us": [last],
            }
        )

    return err.groupBy("user_id").applyInPandas(
        throttle,
        "user_id long, n_errors long, n_alerts long, "
        "first_alert_us long, last_alert_us long",
    )


@query(
    "w_rows_vs_range",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FLOOR((SUM(o_totalprice) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING)) * 100 + 0.5) / 100
             AS running_rows,
           FLOOR((SUM(o_totalprice) OVER (
                    PARTITION BY o_custkey
                    ORDER BY epoch_us(o_orderdate)
                    RANGE UNBOUNDED PRECEDING)) * 100 + 0.5) / 100
             AS running_range
    FROM orders
    """,
)
def w_rows_vs_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default-frame footgun, pinned as a contract: per customer,
    the running order total under a ROWS frame (orderkey tiebreak —
    each order sees only itself and earlier rows) vs a RANGE frame on
    the date (same-date PEERS aggregate together, so two orders placed
    the same day both see both). SQL's default frame with ORDER BY is
    RANGE — the source of most 'running total is wrong on ties' bugs;
    pytest pins that the two columns actually diverge on same-date
    customers in the testdata.

    Scale: both windows share one custkey shuffle and per-customer
    frames — Spark computes them in a single Window node."""
    orders = cat(spark, sf_dir)["orders"]
    wr = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wg = (
        W.partitionBy("o_custkey")
        .orderBy(F.expr("unix_micros(cast(o_orderdate as timestamp))"))
        .rangeBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        money(F.sum("o_totalprice").over(wr)).alias("running_rows"),
        money(F.sum("o_totalprice").over(wg)).alias("running_range"),
    )
