"""Wave 222: model interpretability and admission control.

ml_partial_dependence computes EXACT partial-dependence curves for
the depth-2 histogram tree of ml_hist_tree (same fit, reused
helpers): for every grid value g of a feature, the average model
prediction with that feature FORCED to g while the other feature
keeps its empirical distribution. Because the features are bounded
grids and the model is piecewise-constant, the Monte-Carlo PDP of
the textbooks collapses to a closed form over leaf means and
marginal counts — interpretability as an exact operator, not a
sampling estimate. ev_token_bucket replays token-bucket admission
control over the gap-filled hourly arrival stream (refill = mean
rate, burst = 3x): admitted/dropped per hour are pure integer
recursion, so the op reports exactly which hours throttled, the
worst hour, and the longest throttle streak — the rate-limiter
post-mortem. ev_backlog_reflection prices an infinite queue; the
token bucket prices the DROP policy.

Exactness: PDP is leaf-mean algebra on integer marginals (fit replay
identical to ml_hist_tree's oracle); the token bucket is integers
end to end — no float exists to drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras88 import _best_split, _hist_stats
from mister_spark.registry import query

EPOCH = "1970-01-01"
TB_BURST_X = 3  # burst capacity = this many refill units

# the ml_hist_tree fit chain (d .. s1), reused verbatim so the PDP
# rides the SAME tree the leaf report shows (extras88 oracle)
_TREE_FIT_SQL = """
    d AS (SELECT ((dayofweek(o_orderdate) + 6) % 7) + 1 AS f1,
                 CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS f2,
                 o_totalprice AS y
          FROM orders),
    h0 AS (SELECT 'f1' AS feat, f1 AS bin, CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(y) AS s, SUM(y * y) AS ss
           FROM d GROUP BY 2
           UNION ALL
           SELECT 'f2', f2, CAST(COUNT(*) AS DOUBLE), SUM(y), SUM(y * y)
           FROM d GROUP BY 2),
    c0 AS (SELECT feat, bin,
                  SUM(n) OVER w AS ln, SUM(s) OVER w AS ls,
                  SUM(ss) OVER w AS lss,
                  MAX(bin) OVER (PARTITION BY feat) AS mb
           FROM h0
           WINDOW w AS (PARTITION BY feat ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)),
    t0 AS (SELECT feat, ln AS tn, ls AS ts, lss AS tss FROM (
             SELECT feat, ln, ls, lss,
                    ROW_NUMBER() OVER (PARTITION BY feat
                                       ORDER BY bin DESC) AS rn
             FROM c0) q WHERE rn = 1),
    s0 AS (SELECT c.feat, c.bin AS thr,
                  (t.tss - t.ts * t.ts / t.tn)
                  - ((c.lss - c.ls * c.ls / c.ln)
                     + ((t.tss - c.lss)
                        - (t.ts - c.ls) * (t.ts - c.ls)
                          / (t.tn - c.ln))) AS gain
           FROM c0 c JOIN t0 t ON c.feat = t.feat
           WHERE c.bin < c.mb AND t.tn >= 2
             AND c.ln >= 1 AND t.tn - c.ln >= 1
           ORDER BY gain DESC, c.feat DESC, c.bin DESC LIMIT 1),
    dn AS (SELECT d.*, CASE WHEN (CASE s0.feat WHEN 'f1' THEN d.f1
                                  ELSE d.f2 END) <= s0.thr
                            THEN 1 ELSE 2 END AS node
           FROM d, s0),
    h1 AS (SELECT node, 'f1' AS feat, f1 AS bin,
                  CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s,
                  SUM(y * y) AS ss
           FROM dn GROUP BY 1, 3
           UNION ALL
           SELECT node, 'f2', f2, CAST(COUNT(*) AS DOUBLE), SUM(y),
                  SUM(y * y)
           FROM dn GROUP BY 1, 3),
    c1 AS (SELECT node, feat, bin,
                  SUM(n) OVER w AS ln, SUM(s) OVER w AS ls,
                  SUM(ss) OVER w AS lss,
                  MAX(bin) OVER (PARTITION BY node, feat) AS mb
           FROM h1
           WINDOW w AS (PARTITION BY node, feat ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)),
    t1 AS (SELECT node, feat, ln AS tn, ls AS ts, lss AS tss FROM (
             SELECT node, feat, ln, ls, lss,
                    ROW_NUMBER() OVER (PARTITION BY node, feat
                                       ORDER BY bin DESC) AS rn
             FROM c1) q WHERE rn = 1),
    s1 AS (SELECT node, feat, thr, gain FROM (
             SELECT c.node, c.feat, c.bin AS thr,
                    (t.tss - t.ts * t.ts / t.tn)
                    - ((c.lss - c.ls * c.ls / c.ln)
                       + ((t.tss - c.lss)
                          - (t.ts - c.ls) * (t.ts - c.ls)
                            / (t.tn - c.ln))) AS gain,
                    ROW_NUMBER() OVER (PARTITION BY c.node
                                       ORDER BY (t.tss - t.ts * t.ts
                                                 / t.tn)
                                       - ((c.lss - c.ls * c.ls / c.ln)
                                          + ((t.tss - c.lss)
                                             - (t.ts - c.ls)
                                               * (t.ts - c.ls)
                                               / (t.tn - c.ln))) DESC,
                                       c.feat DESC, c.bin DESC) AS rk
             FROM c1 c JOIN t1 t ON c.node = t.node AND c.feat = t.feat
             WHERE c.bin < c.mb AND t.tn >= 2
               AND c.ln >= 1 AND t.tn - c.ln >= 1) q
           WHERE rk = 1)
"""

_LEAF_CASE = """
    CASE WHEN (CASE s0.feat WHEN 'f1' THEN {v1} ELSE {v2} END)
              <= s0.thr THEN
      CASE WHEN a.gain > 0 THEN
        CASE WHEN (CASE a.feat WHEN 'f1' THEN {v1} ELSE {v2} END)
             <= a.thr THEN 3 ELSE 4 END
      ELSE 1 END
    ELSE
      CASE WHEN b.gain > 0 THEN
        CASE WHEN (CASE b.feat WHEN 'f1' THEN {v1} ELSE {v2} END)
             <= b.thr THEN 5 ELSE 6 END
      ELSE 2 END
    END
"""


@query(
    "ml_partial_dependence",
    # Real oracle: the fit chain is ml_hist_tree's oracle verbatim;
    # leaf means, the (f1, f2) prediction grid and both marginal
    # mixes are exact aggregates, and each PDP point is the same
    # weighted sum, on the grid.
    oracle=f"""
    WITH {_TREE_FIT_SQL},
    lfv AS (SELECT dn.y, {_LEAF_CASE.format(v1="dn.f1", v2="dn.f2")}
                     AS leaf
            FROM dn CROSS JOIN s0
                    LEFT JOIN s1 a ON a.node = 1
                    LEFT JOIN s1 b ON b.node = 2),
    preds AS (SELECT leaf, AVG(y) AS p FROM lfv GROUP BY leaf),
    m1 AS (SELECT f1, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1),
    m2 AS (SELECT f2, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1),
    nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    grid AS (SELECT m1.f1, m2.f2,
                    {_LEAF_CASE.format(v1="m1.f1", v2="m2.f2")} AS leaf
             FROM m1 CROSS JOIN m2 CROSS JOIN s0
             LEFT JOIN s1 a ON a.node = 1
             LEFT JOIN s1 b ON b.node = 2),
    pd1 AS (SELECT 'f1' AS feature, g.f1 AS grid_value,
                   SUM(m2.c * p.p) / nt.n AS pdp
            FROM grid g JOIN m2 ON m2.f2 = g.f2
                 JOIN preds p ON p.leaf = g.leaf, nt
            GROUP BY g.f1, nt.n),
    pd2 AS (SELECT 'f2' AS feature, g.f2 AS grid_value,
                   SUM(m1.c * p.p) / nt.n AS pdp
            FROM grid g JOIN m1 ON m1.f1 = g.f1
                 JOIN preds p ON p.leaf = g.leaf, nt
            GROUP BY g.f2, nt.n),
    un AS (SELECT * FROM pd1 UNION ALL SELECT * FROM pd2)
    SELECT un.feature, CAST(un.grid_value AS BIGINT) AS grid_value,
           FLOOR(un.pdp * 1e4 + 0.5) / 1e4 AS pdp,
           CAST(CASE WHEN un.feature = 'f1'
                THEN (SELECT c FROM m1 WHERE m1.f1 = un.grid_value)
                ELSE (SELECT c FROM m2 WHERE m2.f2 = un.grid_value)
           END AS BIGINT) AS n_support
    FROM un
    """,
)
def ml_partial_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact partial dependence for ml_hist_tree's depth-2 model:
    PDP_f(g) = (1/N) sum over rows of tree(g, other features as
    observed) — computed closed-form as leaf-mean x marginal-count
    algebra because the features are bounded grids and the tree is
    piecewise constant. One row per (feature, grid value) with its
    empirical support. The interpretability question ("holding the
    mix fixed, what does weekday alone do to order value?") answered
    without sampling error, so two runs can be diffed exactly.

    Scale: the fit is ml_hist_tree's two histogram passes; the PDP
    adds only marginal aggregates and a |f1| x |f2| grid join —
    model-sized regardless of row count."""
    d = (
        cat(spark, sf_dir)["orders"]
        .select(
            (((F.dayofweek("o_orderdate") + 5) % 7) + 1)
            .cast("long")
            .alias("f1"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("f2"),
            F.col("o_totalprice").alias("y"),
        )
        .localCheckpoint()
    )
    s0 = _best_split(_hist_stats(d, F.lit(0)), 0)
    gain0, feat0, thr0 = s0
    node1 = F.when(F.col(feat0) <= thr0, 1).otherwise(2)
    l1_rows = _hist_stats(d, node1)
    splits = {}
    for node in (1, 2):
        s = _best_split(l1_rows, node)
        if s is not None and s[0] > 0:
            splits[node] = s

    def leaf_of(v1: int, v2: int) -> int:
        pick = {"f1": v1, "f2": v2}
        if pick[feat0] <= thr0:
            if 1 in splits:
                _, f, t = splits[1]
                return 3 if pick[f] <= t else 4
            return 1
        if 2 in splits:
            _, f, t = splits[2]
            return 5 if pick[f] <= t else 6
        return 2

    leaf_expr = F.when(
        F.col(feat0) <= thr0,
        F.when(F.col(splits[1][1]) <= splits[1][2], 3).otherwise(4)
        if 1 in splits
        else F.lit(1),
    ).otherwise(
        F.when(F.col(splits[2][1]) <= splits[2][2], 5).otherwise(6)
        if 2 in splits
        else F.lit(2),
    )
    preds = {
        r["leaf"]: r["p"]
        for r in d.groupBy(leaf_expr.alias("leaf"))
        .agg(F.avg("y").alias("p"))
        .collect()  # <= 6 leaf means (model-sized)
    }
    m1 = {
        r["f1"]: r["c"]
        for r in d.groupBy("f1").agg(F.count(F.lit(1)).cast("double").alias("c")).collect()
    }
    m2 = {
        r["f2"]: r["c"]
        for r in d.groupBy("f2").agg(F.count(F.lit(1)).cast("double").alias("c")).collect()
    }
    n = sum(m1.values())
    import math

    out = []
    for g in sorted(m1):
        pdp = sum(m2[v2] * preds[leaf_of(g, v2)] for v2 in sorted(m2)) / n
        out.append(
            ("f1", int(g), math.floor(pdp * 1e4 + 0.5) / 1e4, int(m1[g]))
        )
    for g in sorted(m2):
        pdp = sum(m1[v1] * preds[leaf_of(v1, g)] for v1 in sorted(m1)) / n
        out.append(
            ("f2", int(g), math.floor(pdp * 1e4 + 0.5) / 1e4, int(m2[g]))
        )
    return spark.createDataFrame(
        out, "feature string, grid_value long, pdp double, n_support long"
    )


@query(
    "ev_token_bucket",
    # Real oracle: pure integer recursion (refill, clamp, admit,
    # drop) over the gap-filled hour axis, then integer windows for
    # the worst hour and the longest throttle streak — nothing
    # floats except the final drop-rate ratio.
    oracle=f"""
    WITH RECURSIVE a AS (SELECT date_diff('hour',
                      TIMESTAMP '{EPOCH} 00:00:00',
                      date_trunc('hour', ts)) AS h,
                      CAST(COUNT(*) AS BIGINT) AS arr
               FROM events GROUP BY 1),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1,
                      CAST(SUM(arr) AS BIGINT) AS tot FROM a),
    cap AS (SELECT b.tot, b.h1 - b.h0 + 1 AS nh,
                   (b.tot + (b.h1 - b.h0 + 1) - 1)
                     // (b.h1 - b.h0 + 1) AS r,
                   {TB_BURST_X} * ((b.tot + (b.h1 - b.h0 + 1) - 1)
                     // (b.h1 - b.h0 + 1)) AS burst
            FROM bounds b),
    f AS (SELECT hb.h, COALESCE(a.arr, 0) AS arr,
                 ROW_NUMBER() OVER (ORDER BY hb.h) AS i
          FROM (SELECT unnest(generate_series(b.h0, b.h1)) AS h
                FROM bounds b) hb
          LEFT JOIN a ON a.h = hb.h),
    tb AS (
      SELECT CAST(0 AS BIGINT) AS i, cap.burst AS tokens,
             CAST(0 AS BIGINT) AS admitted, CAST(0 AS BIGINT) AS dropped
      FROM cap
      UNION ALL
      SELECT f.i,
             LEAST(tb.tokens + cap.r, cap.burst)
               - LEAST(f.arr, LEAST(tb.tokens + cap.r, cap.burst)),
             LEAST(f.arr, LEAST(tb.tokens + cap.r, cap.burst)),
             f.arr - LEAST(f.arr, LEAST(tb.tokens + cap.r, cap.burst))
      FROM tb JOIN f ON f.i = tb.i + 1 CROSS JOIN cap),
    ser AS (SELECT tb.i, f.h, tb.admitted, tb.dropped
            FROM tb JOIN f ON f.i = tb.i),
    agg AS (SELECT CAST(SUM(admitted) AS BIGINT) AS adm,
                   CAST(SUM(dropped) AS BIGINT) AS dr
            FROM ser),
    worst AS (SELECT h FROM ser
              ORDER BY dropped DESC, h LIMIT 1),
    streak AS (SELECT COALESCE(MAX(cnt), 0) AS s FROM (
                 SELECT COUNT(*) AS cnt FROM (
                   SELECT i, i - ROW_NUMBER() OVER (ORDER BY i) AS grp
                   FROM ser WHERE dropped > 0) q
                 GROUP BY grp))
    SELECT cap.nh AS n_hours, CAST(cap.r AS BIGINT) AS refill_rate,
           CAST(cap.burst AS BIGINT) AS burst_capacity,
           agg.adm AS admitted_total, agg.dr AS dropped_total,
           FLOOR(CAST(agg.dr AS DOUBLE)
                 / GREATEST(cap.tot, 1) * 1e4 + 0.5) / 1e4 AS drop_rate,
           strftime(TIMESTAMP '{EPOCH} 00:00:00'
                    + to_hours(CAST(worst.h AS BIGINT)),
                    '%Y-%m-%d %H:00') AS worst_hour,
           CAST(streak.s AS BIGINT) AS longest_throttle_streak
    FROM cap, agg, worst, streak
    """,
)
def ev_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket admission replay on hourly arrivals: refill =
    ceil(mean rate) per hour, burst capacity {x}x refill, each event
    takes one token; what the bucket can't cover is DROPPED. Reports
    totals, the drop rate, the worst hour and the longest consecutive
    throttle streak — the exact post-mortem of a rate limiter sized
    at nominal load against the traffic that actually arrived
    (ev_backlog_reflection queues the excess; this prices discarding
    it).

    Scale: ONE hour-grain count (map-side combinable); the recursion
    is pure integer state over the calendar-bounded hour frame (the
    documented model-sized carry — as a live stream this is a
    per-key applyInPandasWithState with two integers of state)."""
    rows = (
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
        .orderBy("h")
        .collect()  # calendar-bounded hour frame (documented carry)
    )
    arr = {r["h"]: r["arr"] for r in rows}
    h0, h1 = min(arr), max(arr)
    nh = h1 - h0 + 1
    tot = sum(arr.values())
    r = (tot + nh - 1) // nh
    burst = TB_BURST_X * r
    tokens, adm, dr = burst, 0, 0
    drops = []
    for h in range(h0, h1 + 1):
        tokens = min(tokens + r, burst)
        a = arr.get(h, 0)
        take = min(a, tokens)
        tokens -= take
        adm += take
        drops.append((h, a - take))
    dr = sum(x for _, x in drops)
    worst_h = max(drops, key=lambda p: (p[1], -p[0]))[0]
    streak = best = 0
    for _, x in drops:
        streak = streak + 1 if x > 0 else 0
        best = max(best, streak)
    import datetime as _dt
    import math

    wts = _dt.datetime(1970, 1, 1) + _dt.timedelta(hours=worst_h)
    return spark.createDataFrame(
        [
            (
                nh, r, burst, adm, dr,
                math.floor(dr / max(tot, 1) * 1e4 + 0.5) / 1e4,
                wts.strftime("%Y-%m-%d %H:00"),
                best,
            )
        ],
        "n_hours long, refill_rate long, burst_capacity long, "
        "admitted_total long, dropped_total long, drop_rate double, "
        "worst_hour string, longest_throttle_streak long",
    )


ev_token_bucket.__doc__ = ev_token_bucket.__doc__.format(x=TB_BURST_X)
