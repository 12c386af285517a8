"""Wave 95: survival comparison, bitemporal as-of reads, and quantile
regression.

stat_logrank_test is the log-rank test — THE standard 'do these two
cohorts churn differently' comparison over censored durations, built
on the same at-risk prefix machinery as the KM curve (ev_survival);
scd_bitemporal_asof answers 'what did we believe on date T about the
state as of date V' — the two-clock query that separates corrections
from reality, over a synthesized correction stream so the oracle
replays it; ml_quantile_regression fits the conditional 90th
percentile per weekday (for a categorical predictor the exact
solution IS the within-group quantile) and reports the pinball loss
it minimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

BT_VALID_ASOF = "1998-01-01"  # valid-time clock
BT_TX_ASOF = "1998-02-01"  # transaction-time clock
BT_CORR_DELAY = 10  # corrections recorded this many days later
QR_Q = 0.9


@query(
    "stat_logrank_test",
    oracle=f"""
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts)) AS t0,
                      MIN(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS tp,
                      MAX(epoch_us(ts)) AS t1
               FROM events GROUP BY 1),
    lab AS (SELECT user_id % 2 AS g,
                   (COALESCE(tp, t1) - t0) // 3600000000 AS t,
                   CASE WHEN tp IS NULL THEN 1 ELSE 0 END AS cens
            FROM u),
    tot AS (SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     AS na,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     AS nb
            FROM lab),
    gt AS (SELECT t,
                  CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS ca,
                  CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS cb,
                  CAST(SUM(CASE WHEN g = 0 AND cens = 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) AS da,
                  CAST(SUM(CASE WHEN g = 1 AND cens = 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) AS db
           FROM lab GROUP BY 1),
    rk AS (SELECT t, da, db,
                  tot.na - (SUM(ca) OVER (ORDER BY t) - ca) AS ra,
                  tot.nb - (SUM(cb) OVER (ORDER BY t) - cb) AS rb
           FROM gt, tot),
    terms AS (SELECT da + db AS d, ra + rb AS n, ra, da FROM rk
              WHERE da + db > 0 AND ra + rb > 1),
    s AS (SELECT SUM(da - d * ra / n) AS u,
                 SUM(d * (ra / n) * (1 - ra / n) * (n - d) / (n - 1)) AS v
          FROM terms)
    SELECT CAST(tot.na AS BIGINT) AS na, CAST(tot.nb AS BIGINT) AS nb,
           FLOOR(s.u * 10000 + 0.5) / 10000 AS logrank_u,
           FLOOR(s.v * 10000 + 0.5) / 10000 AS logrank_var,
           FLOOR(s.u / SQRT(s.v) * 10000 + 0.5) / 10000 AS z
    FROM s, tot
    """,  # t = hours to first purchase (censored at last event if none)
)
def stat_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between two user cohorts (user_id parity — a
    deliberate A/A split, so |z| should be small and that is the
    check): at each distinct lifetime t, observed minus expected
    deaths in cohort A under the shared-hazard null, with the
    hypergeometric variance; z = ΣU/√ΣV. Duration = hours from a
    user's first event to their first purchase, censored at the last
    event when no purchase happened — the time-to-convert clock.

    Scale: lifetimes collapse to |distinct t| rows in one shuffle; the
    at-risk counts are `bucketed_cumsum` two-phase prefix sums (no
    single-task window); the test is one aggregate."""
    ev = cat(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
        F.max(us).alias("t1"),
    )
    lab = u.select(
        (F.col("user_id") % 2).alias("g"),
        F.floor(
            (F.coalesce("tp", F.col("t1")) - F.col("t0")) / 3600000000
        ).cast("long").alias("t"),
        F.when(F.col("tp").isNull(), 1).otherwise(0).alias("cens"),
    ).localCheckpoint()
    tot = lab.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    gt = lab.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("double")
        .alias("ca"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("double")
        .alias("cb"),
        F.sum(F.when((F.col("g") == 0) & (F.col("cens") == 0), 1).otherwise(0))
        .cast("double")
        .alias("da"),
        F.sum(F.when((F.col("g") == 1) & (F.col("cens") == 0), 1).otherwise(0))
        .cast("double")
        .alias("db"),
    )
    c = bucketed_cumsum(gt, "t", {"cum_a": F.col("ca"), "cum_b": F.col("cb")})
    rk = c.crossJoin(F.broadcast(tot)).select(
        "da",
        "db",
        (F.col("na") - (F.col("cum_a") - F.col("ca"))).alias("ra"),
        (F.col("nb") - (F.col("cum_b") - F.col("cb"))).alias("rb"),
        "na",
        "nb",
    )
    d = F.col("da") + F.col("db")
    n = F.col("ra") + F.col("rb")
    terms = rk.filter((d > 0) & (n > 1))
    uu = F.sum(F.col("da") - d * F.col("ra") / n)
    vv = F.sum(
        d * (F.col("ra") / n) * (1 - F.col("ra") / n) * (n - d) / (n - 1)
    )
    s = terms.agg(
        ratio(uu).alias("logrank_u"),
        ratio(vv).alias("logrank_var"),
        ratio(uu / F.sqrt(vv)).alias("z"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "logrank_u",
        "logrank_var",
        "z",
    )


@query(
    "scd_bitemporal_asof",
    oracle=f"""
    WITH v0 AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice AS price,
             CAST(o_orderdate AS DATE) AS valid_from,
             CAST(o_orderdate AS DATE) AS tx_from
      FROM orders),
    corr AS (
      SELECT o_orderkey, o_orderpriority,
             FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS price,
             CAST(o_orderdate AS DATE) AS valid_from,
             CAST(o_orderdate AS DATE) + {BT_CORR_DELAY} AS tx_from
      FROM orders WHERE o_orderkey % 10 = 0),
    versions AS (SELECT * FROM v0 UNION ALL SELECT * FROM corr),
    visible AS (
      SELECT * FROM versions
      WHERE valid_from <= DATE '{BT_VALID_ASOF}'
        AND tx_from <= DATE '{BT_TX_ASOF}'),
    latest AS (
      SELECT o_orderkey, o_orderpriority,
             MAX_BY(price, tx_from) AS price
      FROM visible GROUP BY 1, 2)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS orders,
           FLOOR(SUM(price) * 100 + 0.5) / 100 AS total
    FROM latest GROUP BY 1
    """,
)
def scd_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of read: every 10th order receives a +10% price
    CORRECTION recorded {d} days after the fact (transaction time ≠
    valid time). The query answers 'as known on {tx}, what was the
    state as of {v}': rows valid by the valid clock, among versions
    RECORDED by the transaction clock, latest-recorded wins. Move the
    tx clock earlier and the corrections vanish — reproducible
    reports from append-only history, the audit property plain SCD2
    lacks.

    Scale: version expansion is a map-side union; the per-key
    resolution is one max_by aggregate on orderkey — the same single
    exchange cdc_latest uses."""
    orders = cat(spark, sf_dir)["orders"]
    v0 = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.col("o_orderdate").cast("date").alias("tx_from"),
    )
    corr = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        money(F.col("o_totalprice") * 1.1).alias("price"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.date_add(F.col("o_orderdate").cast("date"), BT_CORR_DELAY).alias(
            "tx_from"
        ),
    )
    visible = (
        v0.unionByName(corr)
        .filter(
            (F.col("valid_from") <= F.lit(BT_VALID_ASOF).cast("date"))
            & (F.col("tx_from") <= F.lit(BT_TX_ASOF).cast("date"))
        )
    )
    latest = visible.groupBy("o_orderkey", "o_orderpriority").agg(
        F.max_by("price", "tx_from").alias("price")
    )
    return latest.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("orders"),
        money(F.sum("price")).alias("total"),
    )


scd_bitemporal_asof.__doc__ = scd_bitemporal_asof.__doc__.format(
    d=BT_CORR_DELAY, tx=BT_TX_ASOF, v=BT_VALID_ASOF
)


@query(
    "ml_quantile_regression",
    oracle=f"""
    WITH d AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dw,
                      o_totalprice AS y
               FROM orders),
    g AS (SELECT dw, y,
                 ROW_NUMBER() OVER (PARTITION BY dw ORDER BY y) AS rn,
                 COUNT(*) OVER (PARTITION BY dw) AS n
          FROM d),
    q AS (SELECT dw, MIN(y) AS pred, ANY_VALUE(n) AS n FROM g
          WHERE rn >= CEIL({QR_Q} * n) GROUP BY 1),
    loss AS (SELECT d.dw, q.pred, q.n,
                    CASE WHEN d.y >= q.pred
                         THEN {QR_Q} * (d.y - q.pred)
                         ELSE ({QR_Q} - 1) * (d.y - q.pred) END AS pin
             FROM d JOIN q ON d.dw = q.dw)
    SELECT dw, CAST(n AS BIGINT) AS n,
           FLOOR(pred * 100 + 0.5) / 100 AS q90_pred,
           FLOOR(AVG(pin) * 100 + 0.5) / 100 AS pinball
    FROM loss GROUP BY dw, n, pred
    """,
)
def ml_quantile_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional quantile regression of order totalprice on weekday
    at q = {q}: for a categorical predictor the pinball-loss minimizer
    is EXACTLY the within-group order statistic, so the fit is
    closed-form — per weekday, the q-quantile prediction and the mean
    pinball loss it achieves. The P90-by-segment model behind SLA and
    pricing bands, with its own loss reported.

    Scale: the rank window partitions by weekday (bounded groups run
    in parallel); the loss join broadcasts the 7-row model back onto
    the scan."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1)
        .cast("bigint")
        .alias("dw"),
        F.col("o_totalprice").alias("y"),
    )
    w = W.partitionBy("dw").orderBy("y")
    g = d.select(
        "dw",
        "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("dw")).alias("n"),
    )
    q = (
        g.filter(F.col("rn") >= F.ceil(QR_Q * F.col("n")))
        .groupBy("dw")
        .agg(F.min("y").alias("pred"), F.first("n").alias("n"))
    )
    j = d.join(F.broadcast(q), "dw")
    pin = F.when(
        F.col("y") >= F.col("pred"), QR_Q * (F.col("y") - F.col("pred"))
    ).otherwise((QR_Q - 1) * (F.col("y") - F.col("pred")))
    return j.groupBy("dw", "n", "pred").agg(
        money(F.avg(pin)).alias("pinball")
    ).select(
        "dw",
        F.col("n").cast("bigint").alias("n"),
        money(F.col("pred")).alias("q90_pred"),
        "pinball",
    )


ml_quantile_regression.__doc__ = ml_quantile_regression.__doc__.format(q=QR_Q)
