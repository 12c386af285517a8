"""Wave 44: snapshot-table MERGE, binomial confidence intervals,
operating-point tuning, and rolling correlation.

io_snapshot_merge drives the transactional table's CDC upsert path
(MERGE INTO with stats-pruned copy-on-write); stat_wilson_ci is the
correct small-n interval for any rate metric (the Wald interval most
dashboards use breaks near 0/1); ml_threshold_tuning picks the
classifier's operating point (max-F1 threshold) — the step between
ml_auc's ranking quality and a deployable cutoff; w_rolling_corr
tracks WHEN two series couple, where stat_corr only says whether they
do on average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
WILSON_Z = 1.96
WILSON_THRESHOLD = 100.0  # success := event value above this
TT_POS_LABEL_LT = 5  # mirrors ml_auc / ml_pr_auc
F1_GRID = 100_000_000
CORR_WINDOW = 14  # trailing days
CORR_MIN_N = 7


@query(
    "io_snapshot_merge",
    # Real oracle: the fixed commit structure reduces every version to
    # relational counts — updates hit the [60%,70%] key band (no count
    # change), inserts add LEAST(50, |orders|) brand-new keys past the
    # max, and the stats pruning must leave the first commit's dir
    # untouched (dirs_reused = 1).
    oracle="""
    WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
               FROM orders),
    c AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, b
             WHERE o_orderkey < (mn + mx) // 2) AS n1,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n2,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, b
             WHERE o_orderkey BETWEEN mn + (mx - mn) * 6 // 10
                                  AND mn + (mx - mn) * 7 // 10) AS nu,
            (SELECT CAST(LEAST(50, COUNT(*)) AS BIGINT) FROM orders)
              AS ni)
    SELECT CAST(0 AS BIGINT) AS version, 'create' AS op,
           n1 AS live_rows, CAST(NULL AS BIGINT) AS dirs_reused,
           CAST(NULL AS BIGINT) AS n_updated,
           CAST(NULL AS BIGINT) AS n_inserted
    FROM c
    UNION ALL SELECT 1, 'append', n2, NULL, NULL, NULL FROM c
    UNION ALL SELECT 2, 'merge', n2 + ni, 1, nu, ni FROM c
    """,
)
def io_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the transactional snapshot table: seed orders in
    two commits (split at the key midpoint), then upsert a CDC batch
    that UPDATES a key band inside the second commit's range and
    INSERTS brand-new keys past the max — the latest-row-wins apply
    step cdc_latest computes, executed against versioned storage.
    Emits one audit row per version; the merge row's dirs_reused
    counts dirs the stats pruning left untouched (the first commit's
    dir must survive byte-identical — pinned in tests/test_wave44.py).

    Scale: the incoming batch broadcasts into per-dir anti-joins; only
    key-range-intersecting dirs rewrite. Manifest metadata stays
    O(#commits + #files) driver-side. See sources/snapshots.py."""
    import os
    import tempfile

    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    split = (mn + mx) // 2
    ulo, uhi = mn + (mx - mn) * 6 // 10, mn + (mx - mn) * 7 // 10
    updates = orders.filter(F.col("o_orderkey").between(ulo, uhi)).select(
        "o_orderkey", "o_custkey", (F.col("o_totalprice") + 10.0).alias("o_totalprice")
    )
    inserts = orders.limit(50).select(
        (F.col("o_orderkey") + mx + 1).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    batch = updates.unionByName(inserts)
    with tempfile.TemporaryDirectory(prefix="snapm_") as tmp:
        t = SnapshotTable(
            spark, os.path.join(tmp, "orders_t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.filter(F.col("o_orderkey") < split))
        t.append(orders.filter(F.col("o_orderkey") >= split))
        pre_dirs = {e["dir"] for e in t.history()[-1]["entries"]}
        t.merge(batch, key="o_orderkey")
        final = t.read()
        n_updated = final.filter(
            F.col("o_orderkey").between(ulo, uhi)
        ).join(
            orders.select("o_orderkey", F.col("o_totalprice").alias("old_p")),
            "o_orderkey",
        ).filter(F.col("o_totalprice") == F.col("old_p") + 10.0).count()
        n_inserted = final.filter(F.col("o_orderkey") > mx).count()
        rows = []
        for m in t.history():
            dirs = {e["dir"] for e in m["entries"]}
            rows.append(
                {
                    "version": m["version"],
                    "op": m["op"],
                    "live_rows": int(sum(e["rows"] for e in m["entries"])),
                    "dirs_reused": len(dirs & pre_dirs)
                    if m["op"] == "merge"
                    else None,
                    "n_updated": n_updated if m["op"] == "merge" else None,
                    "n_inserted": n_inserted if m["op"] == "merge" else None,
                }
            )
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows),
        "version bigint, op string, live_rows bigint, dirs_reused bigint, "
        "n_updated bigint, n_inserted bigint",
    )


@query(
    "stat_wilson_ci",
    oracle=f"""
    WITH g AS (SELECT event_type,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN value > {WILSON_THRESHOLD}
                               THEN 1 ELSE 0 END) AS BIGINT) AS k
               FROM events GROUP BY 1)
    SELECT event_type, n, k,
           FLOOR(CAST(k AS DOUBLE) / n * 10000 + 0.5) / 10000 AS rate,
           FLOOR((CAST(k AS DOUBLE) / n + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * SQRT(CAST(k AS DOUBLE) / n
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n) * 10000 + 0.5) / 10000
             AS ci_lo,
           FLOOR((CAST(k AS DOUBLE) / n + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  + {WILSON_Z} * SQRT(CAST(k AS DOUBLE) / n
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n) * 10000 + 0.5) / 10000
             AS ci_hi
    FROM g
    """,
)
def stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the per-type rate of high-value
    events (value > {WILSON_THRESHOLD}) — the binomial CI that stays
    inside [0, 1] and behaves at small n / extreme p̂ where the naive
    Wald interval (p̂ ± z√(p̂q̂/n)) collapses; the number every rate
    on a dashboard should carry. Counts are exact; the interval is
    identical-formula double arithmetic.

    Scale: one partial-agg shuffle to #types rows; everything after
    is per-row arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > WILSON_THRESHOLD, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    z2 = WILSON_Z * WILSON_Z
    center = p + z2 / (2 * n)
    half = WILSON_Z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    denom = 1 + z2 / n
    return g.select(
        "event_type",
        "n",
        "k",
        ratio(p).alias("rate"),
        ratio((center - half) / denom).alias("ci_lo"),
        ratio((center + half) / denom).alias("ci_hi"),
    )


@query(
    "ml_threshold_tuning",
    oracle=f"""
    WITH s AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label < {TT_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings),
    g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM s GROUP BY 1),
    c AS (SELECT score, np, cnt,
                 SUM(np) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
                   AS tp,
                 SUM(cnt) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
                   AS pn
          FROM g),
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p FROM s),
    f AS (SELECT score, tp, pn - tp AS fp, t.p - tp AS fn,
                 CAST(FLOOR(2.0 * tp / (pn + t.p) * {F1_GRID} + 0.5)
                      AS BIGINT) AS f1_g
          FROM c, t),
    best AS (SELECT MAX(f1_g) AS bf FROM f)
    SELECT MAX(f.score) AS threshold,
           CAST(MAX(f.tp) AS BIGINT) AS tp, CAST(MAX(f.fp) AS BIGINT) AS fp,
           CAST(MAX(f.fn) AS BIGINT) AS fn,
           FLOOR(CAST(MAX(f.tp) AS DOUBLE) / (MAX(f.tp) + MAX(f.fp))
                 * 10000 + 0.5) / 10000 AS precision,
           FLOOR(CAST(MAX(f.tp) AS DOUBLE) / (MAX(f.tp) + MAX(f.fn))
                 * 10000 + 0.5) / 10000 AS recall,
           FLOOR(CAST(MAX(f.f1_g) AS DOUBLE) / {F1_GRID} * 10000 + 0.5)
             / 10000 AS f1
    FROM f, best
    WHERE f.f1_g = best.bf
      AND f.score = (SELECT MAX(f2.score) FROM f f2, best b2
                     WHERE f2.f1_g = b2.bf)
    """,
)
def ml_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection: sweep every distinct score as the
    'predict positive if score ≥ t' threshold and report the max-F1
    cutoff with its confusion counts — the step that turns a ranking
    (ml_auc) into a deployable classifier. F1 = 2TP/(pred_pos + P)
    snaps to a 1e-8 grid; ties break to the HIGHEST threshold (fewest
    flagged), so both engines pick the same row.

    Scale: score table collapses to |distinct scores|; both running
    sums ride one two-phase `bucketed_cumsum` (descending via negated
    score); the argmax is a 1-row broadcast join-back."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") < TT_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
    )
    g = (
        s.groupBy("score")
        .agg(
            F.sum("pos").cast("bigint").alias("np"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
        .withColumn("negs", -F.col("score"))
    )
    c = bucketed_cumsum(g, "negs", {"pn": F.col("cnt"), "tp": F.col("np")})
    t = s.agg(F.sum("pos").cast("bigint").alias("p"))
    f = c.crossJoin(F.broadcast(t)).select(
        "score",
        "tp",
        (F.col("pn") - F.col("tp")).alias("fp"),
        (F.col("p") - F.col("tp")).alias("fn"),
        F.floor(2.0 * F.col("tp") / (F.col("pn") + F.col("p")) * F1_GRID + F.lit(0.5))
        .cast("bigint")
        .alias("f1_g"),
    ).localCheckpoint()
    best = f.agg(F.max("f1_g").alias("bf"))
    top = (
        f.join(F.broadcast(best), F.col("f1_g") == F.col("bf"))
        .agg(F.max("score").alias("threshold"))
    )
    return (
        f.join(F.broadcast(top), F.col("score") == F.col("threshold"))
        .select(
            "threshold",
            F.col("tp").cast("bigint").alias("tp"),
            F.col("fp").cast("bigint").alias("fp"),
            F.col("fn").cast("bigint").alias("fn"),
            ratio(F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias(
                "precision"
            ),
            ratio(F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias(
                "recall"
            ),
            ratio(F.col("f1_g").cast("double") / F1_GRID).alias("f1"),
        )
    )


@query(
    "w_rolling_corr",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(FLOOR(SUM(CASE WHEN event_type = 'purchase'
                                     THEN value ELSE 0 END) * 100 + 0.5)
                           AS BIGINT) AS x,
                      CAST(SUM(CASE WHEN event_type = 'error'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
               FROM events GROUP BY 1),
    w AS (SELECT day,
                 CAST(COUNT(*) OVER win AS BIGINT) AS nw,
                 CAST(SUM(x) OVER win AS BIGINT) AS sx,
                 CAST(SUM(y) OVER win AS BIGINT) AS sy,
                 CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
                 CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
                 CAST(SUM(y * y) OVER win AS BIGINT) AS syy
          FROM d
          WINDOW win AS (ORDER BY day RANGE BETWEEN {CORR_WINDOW - 1}
                         PRECEDING AND CURRENT ROW))
    SELECT CAST(day AS BIGINT) AS day, nw,
           CASE WHEN (nw * sxx - sx * sx) * (nw * syy - sy * sy) = 0
                THEN NULL
                ELSE FLOOR((nw * sxy - CAST(sx AS DOUBLE) * sy)
                     / SQRT(CAST((nw * sxx - sx * sx) AS DOUBLE)
                            * (nw * syy - sy * sy)) * 10000 + 0.5) / 10000
           END AS roll_corr
    FROM w WHERE nw >= {CORR_MIN_N}
    """,
)
def w_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {CORR_WINDOW}-day rolling Pearson correlation between
    daily purchase revenue and daily error count — stat_corr says
    whether two series couple ON AVERAGE; this says WHEN (a correlation
    that spikes during incidents and relaxes after is an actionable
    shape a single global number hides). All six window sums are exact
    int64 moments (revenue in cents); the one float is each day's
    final correlation, NULL when either series is flat in the window.

    Scale: one daily partial-agg rollup; all six sums share ONE
    RANGE-frame window over the #days grid (calendar-bounded; month
    partition + carry at multi-year spans)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.select(
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .alias("pv"),
            (F.col("event_type") == "error").cast("long").alias("ec"),
        )
        .groupBy("day")
        .agg(
            F.floor(F.sum("pv") * 100 + F.lit(0.5)).cast("long").alias("x"),
            F.sum("ec").cast("long").alias("y"),
        )
    )
    win = W.orderBy("day").rangeBetween(-(CORR_WINDOW - 1), 0)
    w = d.select(
        "day",
        F.count(F.lit(1)).over(win).cast("bigint").alias("nw"),
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("syy"),
    )
    nw, sx, sy = F.col("nw"), F.col("sx"), F.col("sy")
    vx = nw * F.col("sxx") - sx * sx
    vy = nw * F.col("syy") - sy * sy
    corr = (nw * F.col("sxy") - sx.cast("double") * sy) / F.sqrt(
        vx.cast("double") * vy
    )
    return w.filter(nw >= CORR_MIN_N).select(
        F.col("day").cast("bigint").alias("day"),
        "nw",
        F.when((vx * vy) == 0, F.lit(None).cast("double"))
        .otherwise(ratio(corr))
        .alias("roll_corr"),
    )
