"""Wave 218: Bayesian online changepoint detection and queue backlog.

ev_bocpd is Adams-MacKay Bayesian online changepoint detection on
daily event volume: a run-length posterior updated day by day under
a constant hazard and a conjugate Gaussian predictive, reporting
P(changepoint) and the MAP run length PER DAY. Pettitt
(ev_pettitt_test) finds the single best split in hindsight; BOCPD is
the ONLINE answer — what a monitor would have believed on each day
as it happened, with uncertainty attached. The oracle replays the
full forward recursion as a recursive CTE (grow + merged-change
branches, renormalized each step — the mass merge rides a grouped
subquery inside the recursive term). ev_backlog_reflection is the
G/D/1 queue backlog under fixed hourly capacity computed CLOSED-FORM
via Lindley's reflection identity W_h = cum_h - min_{j<=h} cum_j —
no simulation loop, just prefix sums and a running minimum, which is
why it still works when the "queue" is 100 TB of events: peak
backlog, when it happened, how often the system was behind, and the
utilization that explains it.

Exactness: BOCPD carries shared closed-form predictives on exact
prefix sums (rounded 1e-6 at the end); the backlog op is pure
integer arithmetic (capacity from a cross-multiplied ceil) until the
two final ratios.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
BOCPD_HAZARD = 0.05  # constant changepoint hazard per day
BOCPD_KAPPA = 1.0  # prior pseudo-observations
CAP_PCT = 110  # capacity = ceil(110% of mean hourly arrivals)


@query(
    "ev_bocpd",
    # Real oracle: the forward recursion replays exactly — prefix
    # sums are exact, the Gaussian predictive is the same closed
    # form, the change-branch mass merge is a grouped subquery inside
    # the recursive term, each step renormalizes, and the per-day
    # outputs are read on the 1e-6 grid with a smallest-run MAP
    # tiebreak.
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE)) AS t,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1),
    idx AS (SELECT ROW_NUMBER() OVER (ORDER BY t) AS i, t, y,
                   SUM(y) OVER (ORDER BY t) AS s
            FROM d),
    -- noise scale from FIRST DIFFERENCES (var(dy)/2): robust to the
    -- very level shifts the detector exists to find — the global
    -- variance of a shifted series would swamp the predictive
    pr AS (SELECT (SELECT AVG(y) FROM d) AS mu0,
                  GREATEST((SELECT VAR_SAMP(dy) / 2 FROM (
                     SELECT y - LAG(y) OVER (ORDER BY t) AS dy
                     FROM d) WHERE dy IS NOT NULL), 1e-9) AS sig2),
    -- prefix sums including the s[0] = 0 row the longest-run history
    -- join needs (union wrapped in a subquery: top-level UNION in a
    -- CTE body misparses under WITH RECURSIVE in DuckDB 1.0)
    pre AS (SELECT i, s FROM (
              SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS DOUBLE) AS s
              UNION ALL SELECT i, s FROM idx)),
    bo AS (
      SELECT CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS r,
             CAST(1.0 AS DOUBLE) AS w
      UNION ALL
      SELECT i, r, SUM(wu) / SUM(SUM(wu)) OVER (PARTITION BY i) AS w
      FROM (
        SELECT nx.i AS i,
               CASE m.mode WHEN 1 THEN bo.r + 1 ELSE 1 END AS r,
               bo.w
               * CASE m.mode WHEN 1 THEN 1 - {BOCPD_HAZARD}
                             ELSE {BOCPD_HAZARD} END
               * EXP(-(nx.y - ({BOCPD_KAPPA} * pr.mu0 +
                       (pv.s - CASE m.mode WHEN 1 THEN hist.s
                                           ELSE pv.s END))
                      / ({BOCPD_KAPPA}
                         + CASE m.mode WHEN 1 THEN bo.r ELSE 0 END))
                      * (nx.y - ({BOCPD_KAPPA} * pr.mu0 +
                         (pv.s - CASE m.mode WHEN 1 THEN hist.s
                                             ELSE pv.s END))
                        / ({BOCPD_KAPPA}
                           + CASE m.mode WHEN 1 THEN bo.r ELSE 0 END))
                      / (2 * pr.sig2 * (1 + 1 / ({BOCPD_KAPPA}
                         + CASE m.mode WHEN 1 THEN bo.r ELSE 0 END))))
               / SQRT(2 * PI() * pr.sig2 * (1 + 1 / ({BOCPD_KAPPA}
                      + CASE m.mode WHEN 1 THEN bo.r ELSE 0 END)))
                 AS wu
        FROM bo
        CROSS JOIN (VALUES (0), (1)) m(mode)
        CROSS JOIN pr
        JOIN idx nx ON nx.i = bo.i + 1
        JOIN idx pv ON pv.i = bo.i
        JOIN pre hist ON hist.i = bo.i - bo.r
      ) q GROUP BY i, r),
    best AS (SELECT i, r, w,
                    ROW_NUMBER() OVER (PARTITION BY i
                      ORDER BY FLOOR(w * 1e6 + 0.5) DESC, r) AS rk
             FROM bo)
    SELECT strftime(DATE '{EPOCH}' + CAST(idx.t AS INT), '%Y-%m-%d')
             AS day,
           FLOOR(COALESCE((SELECT w FROM bo b2
                           WHERE b2.i = idx.i AND b2.r = 1), 0.0)
                 * 1e6 + 0.5) / 1e6 AS p_change,
           (SELECT r FROM best WHERE best.i = idx.i AND rk = 1)
             AS map_run
    FROM idx
    """,
)
def ev_bocpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adams-MacKay BOCPD on daily volume: per day, the posterior
    over "how long since the last changepoint" under hazard
    H = {h} and a conjugate Gaussian predictive (prior mean/variance
    from the series itself, kappa = {k} pseudo-observations).
    p_change is the mass on run length 1 — the online belief that
    TODAY started a new regime; map_run is the posterior-mode run
    length (smallest run on rounded ties). The online counterpart of
    ev_pettitt_test's retrospective split: this is what the alert
    would have said at the time, not what hindsight says now.

    Scale: ONE day-grain count collapses everything to the
    calendar-bounded frame; the forward recursion is O(days^2) states
    on that model-sized series (the documented bounded carry — at
    stream scale the same recursion runs as
    applyInPandasWithState per key with the run-length vector as
    state). A recursive-CTE twin replays it exactly."""
    rows = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("t")
        .collect()  # calendar-bounded day frame (documented carry)
    )
    ts = [r["t"] for r in rows]
    ys = [r["y"] for r in rows]
    n = len(ys)
    mu0 = sum(ys) / n
    # noise from first differences (see the oracle comment)
    dys = [b - a for a, b in zip(ys, ys[1:])]
    if len(dys) > 1:
        md = sum(dys) / len(dys)
        vd = sum((v - md) * (v - md) for v in dys) / (len(dys) - 1)
    else:
        vd = 0.0
    sig2 = max(vd / 2, 1e-9)
    s = [0.0]
    for v in ys:
        s.append(s[-1] + v)
    H, K = BOCPD_HAZARD, BOCPD_KAPPA

    def pred(i: int, r: int) -> float:
        # predictive for y at step i (1-based) given r prior run obs
        m = (K * mu0 + (s[i - 1] - s[i - 1 - r])) / (K + r)
        v = sig2 * (1 + 1 / (K + r))
        d = ys[i - 1] - m
        return math.exp(-d * d / (2 * v)) / math.sqrt(2 * math.pi * v)

    w = {1: 1.0}
    out = [(ts[0], 1.0, 1)]
    for i in range(2, n + 1):
        grow = {r + 1: wv * (1 - H) * pred(i, r) for r, wv in w.items()}
        change = sum(wv * H * pred(i, 0) for wv in w.values())
        nw = dict(grow)
        nw[1] = nw.get(1, 0.0) + change
        tot = sum(nw.values())
        w = {r: wv / tot for r, wv in nw.items()}
        g = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        map_run = min(
            (r for r in w), key=lambda r: (-g(w[r]), r)
        )
        out.append((ts[i - 1], g(w.get(1, 0.0)), map_run))
    epoch0 = __import__("datetime").date(1970, 1, 1)
    day = __import__("datetime").timedelta
    return spark.createDataFrame(
        [
            ((epoch0 + day(days=t)).strftime("%Y-%m-%d"), p, int(r))
            for t, p, r in out
        ],
        "day string, p_change double, map_run long",
    )


ev_bocpd.__doc__ = ev_bocpd.__doc__.format(h=BOCPD_HAZARD, k=BOCPD_KAPPA)


@query(
    "ev_backlog_reflection",
    # Real oracle: hourly arrivals, the gap-filled hour axis, the
    # cross-multiplied capacity ceil, prefix sums and the running
    # minimum are all integers; only utilization and the backlogged
    # share divide, on the grid.
    oracle=f"""
    WITH a AS (SELECT date_diff('hour', TIMESTAMP '{EPOCH} 00:00:00',
                      date_trunc('hour', ts)) AS h,
                      CAST(COUNT(*) AS BIGINT) AS arr
               FROM events GROUP BY 1),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1,
                      CAST(SUM(arr) AS BIGINT) AS tot FROM a),
    hours AS (SELECT unnest(generate_series(b.h0, b.h1)) AS h
              FROM bounds b),
    cap AS (SELECT b.tot, b.h1 - b.h0 + 1 AS nh,
                   ({CAP_PCT} * b.tot + 100 * (b.h1 - b.h0 + 1) - 1)
                   // (100 * (b.h1 - b.h0 + 1)) AS c
            FROM bounds b),
    f AS (SELECT hours.h, COALESCE(a.arr, 0) AS arr
          FROM hours LEFT JOIN a ON a.h = hours.h),
    cum AS (SELECT f.h, f.arr,
                   SUM(f.arr - cap.c) OVER (ORDER BY f.h) AS cu
            FROM f, cap),
    refl AS (SELECT h, arr, cu,
                    cu - LEAST(MIN(cu) OVER (ORDER BY h), 0) AS backlog
             FROM cum),
    tr AS (SELECT h, backlog,
                  CASE WHEN backlog > 0 AND COALESCE(LAG(backlog)
                       OVER (ORDER BY h), 0) = 0 THEN 1 ELSE 0 END
                    AS starts
           FROM refl),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(MAX(backlog) AS BIGINT) AS peak,
                   CAST(SUM(CASE WHEN backlog > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS busy_hours,
                   CAST(SUM(starts) AS BIGINT) AS busy_periods
            FROM tr),
    pk AS (SELECT h FROM tr, agg WHERE tr.backlog = agg.peak
           ORDER BY h LIMIT 1)
    SELECT agg.n_hours, CAST(cap.c AS BIGINT) AS capacity,
           agg.peak AS peak_backlog,
           strftime(TIMESTAMP '{EPOCH} 00:00:00'
                    + to_hours(CAST(pk.h AS BIGINT)),
                    '%Y-%m-%d %H:00') AS peak_hour,
           FLOOR(CAST(agg.busy_hours AS DOUBLE) / agg.n_hours * 1e4
                 + 0.5) / 1e4 AS pct_hours_backlogged,
           agg.busy_periods,
           FLOOR(CAST(cap.tot AS DOUBLE) / (cap.c * agg.n_hours) * 1e4
                 + 0.5) / 1e4 AS utilization
    FROM agg, cap, pk
    """,
)
def ev_backlog_reflection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G/D/1 backlog under fixed hourly capacity ({pct}% of mean
    arrivals, integer-ceiled) via Lindley's reflection identity:
    W_h = cum_h - min(0, min_j<=h cum_j) where cum is the prefix sum
    of (arrivals - capacity) over the GAP-FILLED hour axis. The whole
    queue simulation collapses to one prefix sum and one running
    minimum — no per-step loop — so the same plan prices a backlog
    on any horizon. Reports the peak backlog and its hour, how often
    the system was behind, how many distinct busy periods there
    were, and the utilization that makes it all legible.

    Scale: one hour-grain count (map-side combinable), a calendar-
    bounded gap-fill, and two ordered windows on that bounded frame
    (the documented model-sized carry)."""
    a = (
        cat(spark, sf_dir)["events"]
        .select(
            F.floor(
                F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600
            )
            .cast("bigint")
            .alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("arr"))
        .localCheckpoint()  # bounded hour frame
    )
    bounds = a.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1"),
        F.sum("arr").alias("tot"),
    )
    cap = bounds.select(
        "tot",
        (F.col("h1") - F.col("h0") + 1).alias("nh"),
        F.floor(
            (
                CAP_PCT * F.col("tot")
                + 100 * (F.col("h1") - F.col("h0") + 1)
                - 1
            )
            / (100 * (F.col("h1") - F.col("h0") + 1))
        )
        .cast("bigint")
        .alias("c"),
    )
    hours = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    f = hours.join(a, "h", "left").select(
        "h", F.coalesce(F.col("arr"), F.lit(0)).alias("arr")
    )
    cum = f.crossJoin(F.broadcast(cap)).select(
        "h", "arr",
        F.sum(F.col("arr") - F.col("c"))
        .over(W.orderBy("h").rowsBetween(W.unboundedPreceding, 0))
        .alias("cu"),
    )
    refl = cum.select(
        "h",
        (
            F.col("cu")
            - F.least(
                F.min("cu").over(
                    W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
                ),
                F.lit(0),
            )
        ).alias("backlog"),
    ).localCheckpoint()  # bounded; feeds peaks + transitions
    tr = refl.select(
        "h", "backlog",
        F.when(
            (F.col("backlog") > 0)
            & (
                F.coalesce(
                    F.lag("backlog").over(W.orderBy("h")), F.lit(0)
                )
                == 0
            ),
            1,
        )
        .otherwise(0)
        .alias("starts"),
    )
    agg = tr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("backlog").cast("bigint").alias("peak"),
        F.sum(F.when(F.col("backlog") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("busy_hours"),
        F.sum("starts").cast("bigint").alias("busy_periods"),
    )
    pk = (
        tr.crossJoin(F.broadcast(agg.select("peak")))
        .filter(F.col("backlog") == F.col("peak"))
        .orderBy("h")
        .limit(1)
        .select("h")
    )
    return (
        agg.crossJoin(F.broadcast(cap))
        .crossJoin(F.broadcast(pk))
        .select(
            "n_hours",
            F.col("c").cast("bigint").alias("capacity"),
            F.col("peak").alias("peak_backlog"),
            F.date_format(
                F.timestamp_seconds(F.col("h") * 3600), "yyyy-MM-dd HH:00"
            ).alias("peak_hour"),
            rnd(
                F.col("busy_hours").cast("double") / F.col("n_hours"), 4
            ).alias("pct_hours_backlogged"),
            "busy_periods",
            rnd(
                F.col("tot").cast("double")
                / (F.col("c") * F.col("n_hours")),
                4,
            ).alias("utilization"),
        )
    )


ev_backlog_reflection.__doc__ = ev_backlog_reflection.__doc__.format(
    pct=CAP_PCT
)
