"""Wave 49: time-series inference — sequential drift detection, causal
effect estimation, momentum, and partial autocorrelation.

ev_cusum_detect is the page-one sequential change detector (CUSUM),
computed distributively via the running-sum-minus-running-min identity
instead of its textbook recursion; ev_did is difference-in-differences,
the workhorse causal estimate for "did the launch move the metric";
ev_acceleration finds the days where growth itself changed (second
difference); stat_pacf gives the AR-order diagnostic (Durbin–Levinson
over Spark-computed autocovariances — the O(model) driver recursion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
CUSUM_K = 0.5  # slack in sigma units
CUSUM_H = 1.5  # alarm threshold in sigma units (30-day series)
DID_TREATED_TYPE = "purchase"
DID_CONTROL_TYPE = "view"
PACF_MAX_LAG = 7
ACCEL_TOP = 15


@query(
    "ev_cusum_detect",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, STDDEV_SAMP(y) AS sd FROM d),
    z AS (SELECT day, y, (y - mu) / sd - {CUSUM_K} AS zk,
                 -((y - mu) / sd) - {CUSUM_K} AS zkn
          FROM d, m),
    p AS (SELECT day, y,
                 SUM(zk) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pu,
                 SUM(zkn) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd
          FROM z),
    s AS (SELECT day, y,
                 pu - LEAST(0.0, MIN(pu) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING)) AS su,
                 pd - LEAST(0.0, MIN(pd) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING)) AS sd2
          FROM p)
    SELECT CAST(day AS BIGINT) AS day, y,
           FLOOR(su * 10000 + 0.5) / 10000 AS cusum_up,
           FLOOR(sd2 * 10000 + 0.5) / 10000 AS cusum_down,
           (su > {CUSUM_H} OR sd2 > {CUSUM_H}) AS alarm
    FROM s
    ORDER BY day
    """,
)
def ev_cusum_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection on the daily event-count
    series: per-day up/down CUSUM statistics (slack k={CUSUM_K}σ) with
    an alarm flag at h={CUSUM_H}σ. The textbook recursion
    S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − k) is NOT window-expressible — but it
    equals Pₜ − min(0, min_{{j≤t}} Pⱼ) for the plain prefix sum
    Pₜ = Σ(zⱼ − k), so two stock windows over the day grid compute it
    exactly; same identity mirrored for the downward side.

    Scale: one partial-agg rollup to the CALENDAR-BOUNDED day grid;
    both prefix windows order that model-sized frame. At multi-decade
    spans the same two sums ride `bucketed_cumsum`."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = d.agg(F.avg("y").alias("mu"), F.stddev_samp("y").alias("sd"))
    z = d.crossJoin(F.broadcast(m)).select(
        "day",
        "y",
        ((F.col("y") - F.col("mu")) / F.col("sd") - CUSUM_K).alias("zk"),
        (-((F.col("y") - F.col("mu")) / F.col("sd")) - CUSUM_K).alias("zkn"),
    )
    wp = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p = z.select(
        "day",
        "y",
        F.sum("zk").over(wp).alias("pu"),
        F.sum("zkn").over(wp).alias("pd"),
    )
    s = p.select(
        "day",
        "y",
        (F.col("pu") - F.least(F.lit(0.0), F.min("pu").over(wp))).alias("su"),
        (F.col("pd") - F.least(F.lit(0.0), F.min("pd").over(wp))).alias("sd2"),
    )
    return (
        s.select(
            F.col("day").cast("bigint").alias("day"),
            "y",
            ratio(F.col("su")).alias("cusum_up"),
            ratio(F.col("sd2")).alias("cusum_down"),
            ((F.col("su") > CUSUM_H) | (F.col("sd2") > CUSUM_H)).alias(
                "alarm"
            ),
        )
        .orderBy("day")
    )


@query(
    "ev_did",
    oracle=f"""
    WITH r AS (SELECT MIN(epoch_us(ts)) // {DAY_US} AS d0,
                      MAX(epoch_us(ts)) // {DAY_US} AS d1 FROM events),
    e AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) // {DAY_US} >= (d0 + d1 + 1) // 2
                      THEN 1 ELSE 0 END AS post,
                 value
          FROM events, r
          WHERE event_type IN ('{DID_TREATED_TYPE}', '{DID_CONTROL_TYPE}')),
    g AS (SELECT event_type, post,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 FLOOR(AVG(value) * 10000 + 0.5) / 10000 AS avg_value
          FROM e GROUP BY 1, 2),
    w AS (SELECT
        MAX(CASE WHEN event_type = '{DID_TREATED_TYPE}' AND post = 1
                 THEN avg_value END) AS t1,
        MAX(CASE WHEN event_type = '{DID_TREATED_TYPE}' AND post = 0
                 THEN avg_value END) AS t0,
        MAX(CASE WHEN event_type = '{DID_CONTROL_TYPE}' AND post = 1
                 THEN avg_value END) AS c1,
        MAX(CASE WHEN event_type = '{DID_CONTROL_TYPE}' AND post = 0
                 THEN avg_value END) AS c0,
        CAST(SUM(n) AS BIGINT) AS n_events
      FROM g)
    SELECT n_events, t0 AS treated_pre, t1 AS treated_post,
           c0 AS control_pre, c1 AS control_post,
           FLOOR(((t1 - t0) - (c1 - c0)) * 10000 + 0.5) / 10000 AS did
    FROM w
    """,
)
def ev_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on event value: treated =
    '{DID_TREATED_TYPE}', control = '{DID_CONTROL_TYPE}', intervention
    at the observation-range midpoint. DiD = (treated_post −
    treated_pre) − (control_post − control_pre) — the causal estimate
    that subtracts out the shared time trend a naive before/after
    comparison swallows. Cell means are snapped to the 1e-4 grid
    before differencing so both engines difference identical numbers.

    Scale: the whole estimate is sufficient statistics — one
    partial-agg pass to 4 (group × period) cells after a broadcast
    date-range row; the DiD arithmetic is a 1-row pivot."""
    ev = cat(spark, sf_dir)["events"]
    r = ev.agg(
        (F.min(F.expr("unix_micros(ts)")) / DAY_US).cast("long").alias("d0"),
        (F.max(F.expr("unix_micros(ts)")) / DAY_US).cast("long").alias("d1"),
    )
    e = (
        ev.filter(F.col("event_type").isin(DID_TREATED_TYPE, DID_CONTROL_TYPE))
        .crossJoin(F.broadcast(r))
        .select(
            "event_type",
            F.when(
                F.expr(f"unix_micros(ts) div {DAY_US}")
                >= (F.col("d0") + F.col("d1") + 1) / 2,
                1,
            )
            .otherwise(0)
            .alias("post"),
            "value",
        )
    )
    g = e.groupBy("event_type", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(F.avg("value")).alias("avg_value"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("event_type") == t) & (F.col("post") == p),
                F.col("avg_value"),
            )
        )

    w = g.agg(
        cell(DID_TREATED_TYPE, 1).alias("t1"),
        cell(DID_TREATED_TYPE, 0).alias("t0"),
        cell(DID_CONTROL_TYPE, 1).alias("c1"),
        cell(DID_CONTROL_TYPE, 0).alias("c0"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return w.select(
        "n_events",
        F.col("t0").alias("treated_pre"),
        F.col("t1").alias("treated_post"),
        F.col("c0").alias("control_pre"),
        F.col("c1").alias("control_post"),
        ratio(
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))
        ).alias("did"),
    )


@query(
    "ev_acceleration",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    l AS (SELECT day, y,
                 LAG(y, 1) OVER (ORDER BY day) AS y1,
                 LAG(y, 2) OVER (ORDER BY day) AS y2
          FROM d)
    SELECT CAST(day AS BIGINT) AS day, y,
           CAST(y - y1 AS BIGINT) AS velocity,
           CAST(y - 2 * y1 + y2 AS BIGINT) AS acceleration
    FROM l WHERE y2 IS NOT NULL
    ORDER BY ABS(y - 2 * y1 + y2) DESC, day LIMIT {ACCEL_TOP}
    """,
)
def ev_acceleration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count velocity (first difference) and acceleration
    (second difference), top-{ACCEL_TOP} days by |acceleration| — the
    days where GROWTH ITSELF changed, which lead every incident and
    launch postmortem (a big velocity day with zero acceleration is
    just an already-fast trend). Pure integer differences, no floats
    anywhere.

    Scale: one partial-agg rollup to the calendar-bounded day grid;
    the two lags share one window over that model-sized frame; top-N
    is a distributed TakeOrdered on the integer measure."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    lw = W.orderBy("day")
    l = d.select(
        "day",
        "y",
        F.lag("y", 1).over(lw).alias("y1"),
        F.lag("y", 2).over(lw).alias("y2"),
    ).filter(F.col("y2").isNotNull())
    out = l.select(
        F.col("day").cast("bigint").alias("day"),
        "y",
        (F.col("y") - F.col("y1")).cast("bigint").alias("velocity"),
        (F.col("y") - 2 * F.col("y1") + F.col("y2"))
        .cast("bigint")
        .alias("acceleration"),
    )
    return out.orderBy(F.abs(F.col("acceleration")).desc(), "day").limit(
        ACCEL_TOP
    )


@query(
    "stat_pacf",
    # Real oracle: the autocovariances are the same gap-aware lag
    # joins, collected into a DOUBLE list; Durbin-Levinson then runs
    # as a recursive CTE whose single working row carries (k, v, phi
    # list), emitting phi_kk per step — sequential arithmetic in the
    # exact Python order, bit-identical before rounding.
    oracle=f"""
    WITH RECURSIVE d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                                CAST(COUNT(*) AS DOUBLE) AS y
                         FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    c AS (SELECT day, y - m.mu AS e FROM d CROSS JOIN m),
    gk AS (SELECT lag.k,
                  (SELECT SUM(a.e * b.e) / MAX(m.n)
                   FROM c a JOIN c b ON a.day = b.day + lag.k
                   CROSS JOIN m) AS g
           FROM (SELECT unnest(generate_series(0, {PACF_MAX_LAG})) AS k)
                  lag),
    gl AS (SELECT list(g ORDER BY k) AS g FROM gk),
    dl AS (
      SELECT 0 AS k, (SELECT g[1] FROM gl) AS v,
             CAST([] AS DOUBLE[]) AS phi,
             CAST(0.0 AS DOUBLE) AS pk
      UNION ALL
      SELECT q.k, q.v * (1 - q.pk * q.pk),
             list_append(
               list_transform(range(1, q.k),
                 j -> q.phi[j] - q.pk * q.phi[q.k - j]),
               q.pk),
             q.pk
      FROM (
        SELECT s.k + 1 AS k,
               s.v,
               s.phi,
               CASE WHEN s.v <> 0 THEN
                 (g.g[s.k + 2]
                  - COALESCE(list_aggregate(
                      list_transform(range(1, s.k + 1),
                        j -> s.phi[j] * g.g[s.k + 2 - j]), 'sum'), 0.0))
                 / s.v
               ELSE 0.0 END AS pk
        FROM dl s CROSS JOIN gl g
        WHERE s.k < {PACF_MAX_LAG}) q
    )
    SELECT CAST(dl.k AS BIGINT) AS lag,
           FLOOR(dl.pk * 10000 + 0.5) / 10000 AS pacf,
           FLOOR(g.g[dl.k + 1] / g.g[1] * 10000 + 0.5) / 10000 AS acf
    FROM dl CROSS JOIN gl g WHERE dl.k >= 1
    """,
)
def stat_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..{PACF_MAX_LAG} via Durbin–Levinson — the AR-order diagnostic
    (PACF cutting off after lag p ⇒ AR(p)); the ACF alone
    (ev_autocorr) can't separate direct from inherited correlation.

    Scale: Spark computes the {PACF_MAX_LAG}+1 autocovariances with
    one day-grid rollup and a bounded self-join (lag alignment on the
    model-sized series); the Durbin–Levinson recursion runs
    driver-side on those {PACF_MAX_LAG}+1 scalars — an O(model)
    collect, same budget as ml_pca's Gramian. Gated in
    tests/test_wave49.py: pacf(1) == acf(1), |pacf| ≤ 1."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y")).localCheckpoint()
    m = d.agg(F.avg("y").alias("mu"), F.count(F.lit(1)).alias("n"))
    c = d.crossJoin(F.broadcast(m)).select(
        "day", (F.col("y") - F.col("mu")).alias("e"), "n"
    )
    lagged = c.select(F.col("day").alias("dl"), F.col("e").alias("el"))
    acvs = []
    for k in range(0, PACF_MAX_LAG + 1):
        jk = c.join(
            lagged, c["day"] == (F.col("dl") + k), "inner"
        ).agg(
            (F.sum(F.col("e") * F.col("el")) / F.max("n")).alias("g")
        )
        acvs.append(jk)
    gamma = [fr.collect()[0]["g"] for fr in acvs]
    # Durbin-Levinson on the collected autocovariances (O(model))
    phi_prev: list[float] = []
    pacf = []
    v = gamma[0]
    for k in range(1, PACF_MAX_LAG + 1):
        acc = gamma[k] - sum(
            phi_prev[j] * gamma[k - 1 - j] for j in range(len(phi_prev))
        )
        phi_kk = acc / v if v != 0 else 0.0
        phi_new = [
            phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
            for j in range(len(phi_prev))
        ]
        phi_prev = phi_new + [phi_kk]
        v = v * (1 - phi_kk * phi_kk)
        pacf.append((k, phi_kk))
    import pandas as pd

    import math

    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    out = pd.DataFrame(
        {
            "lag": [k for k, _ in pacf],
            "pacf": [r4(p) for _, p in pacf],
            "acf": [r4(gamma[k] / gamma[0]) for k, _ in pacf],
        }
    )
    return spark.createDataFrame(out, "lag bigint, pacf double, acf double")
