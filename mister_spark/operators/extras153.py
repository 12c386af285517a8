"""Wave 153: forecastability scoring and fairness threshold solving.

ev_forecastability condenses the daily series' spectrum into one
number — 1 minus normalized spectral entropy — high when energy
concentrates in few frequencies (forecastable rhythm), near zero for
white noise; the triage that says which series DESERVE a model
before anyone fits one; ml_fair_thresholds solves per-group score
thresholds that equalize true-positive rates across groups — the
post-processing remediation for the gaps ml_fairness_audit measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

FAIR_TPR_TARGET = 0.8


@query(
    "ev_forecastability",
    # Real oracle: the periodogram is a (position × frequency) cross
    # join with cos/sin sums, the spectral entropy a filtered
    # aggregate over the normalized powers, and the dominant period
    # the (power DESC, k) argmax — all per event type, no recursion.
    oracle="""
    WITH d AS (SELECT event_type,
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, y,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) - 1 AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS n,
                 AVG(y) OVER (PARTITION BY event_type) AS mu
          FROM d),
    ks AS (SELECT DISTINCT event_type, n,
                  unnest(generate_series(1, CAST(n // 2 AS INT))) AS k
           FROM s),
    pw AS (SELECT ks.event_type, ks.k, ks.n,
                  POWER(SUM((s.y - s.mu)
                            * COS(2 * PI() * ks.k * s.i / ks.n)), 2)
                  + POWER(SUM((s.y - s.mu)
                              * SIN(2 * PI() * ks.k * s.i / ks.n)), 2)
                    AS p
           FROM ks JOIN s ON s.event_type = ks.event_type
           GROUP BY 1, 2, 3),
    tot AS (SELECT event_type, n,
                   CASE WHEN SUM(p) = 0 THEN 1.0 ELSE SUM(p) END AS tp,
                   CAST(COUNT(*) AS DOUBLE) AS nk
            FROM pw GROUP BY 1, 2),
    ent AS (SELECT t.event_type, t.n,
                   -COALESCE(SUM(CASE WHEN pw.p > 0
                                 THEN pw.p / t.tp * LN(pw.p / t.tp) END),
                             0.0) AS h,
                   CASE WHEN t.nk > 1 THEN LN(t.nk) ELSE 1.0 END AS hmax
            FROM pw JOIN tot t USING (event_type)
            GROUP BY 1, 2, t.nk),
    peak AS (SELECT event_type, k FROM (
               SELECT event_type, k,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY p DESC, k) AS rn
               FROM pw) q WHERE rn = 1)
    SELECT e.event_type, CAST(e.n AS BIGINT) AS days,
           FLOOR((1.0 - e.h / e.hmax) * 10000 + 0.5) / 10000
             AS forecastability,
           FLOOR(CAST(e.n AS DOUBLE) / pk.k * 100 + 0.5) / 100
             AS dominant_period_days
    FROM ent e JOIN peak pk USING (event_type)
    """,
)
def ev_forecastability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecastability score per event type: 1 − H(power)/ln(K) over
    the daily-count series' periodogram (driver DFT on the
    calendar-bounded series). A score near 1 means the series is a
    few clean rhythms (model it); near 0 means white noise (don't —
    report the mean and stop). The portfolio triage that should
    precede every forecasting project.

    Scale: one daily rollup per type; the DFT is O(days²) driver
    arithmetic on the calendar-bounded series (days ≤ thousands —
    trivial; FFT if it ever mattered)."""
    import math

    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .collect()
    )
    by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[int(r["day"])] = float(
            r["y"]
        )
    out = []
    for etype in sorted(by_type):
        series_map = by_type[etype]
        days = sorted(series_map)
        ys = [series_map[d] for d in days]
        n = len(ys)
        mean = sum(ys) / n
        xs = [y - mean for y in ys]
        powers = []
        for k in range(1, n // 2 + 1):
            re = sum(
                x * math.cos(2 * math.pi * k * i / n)
                for i, x in enumerate(xs)
            )
            im = sum(
                x * math.sin(2 * math.pi * k * i / n)
                for i, x in enumerate(xs)
            )
            powers.append(re * re + im * im)
        tot = sum(powers) or 1.0
        ps = [p / tot for p in powers if p > 0]
        h = -sum(p * math.log(p) for p in ps)
        hmax = math.log(len(powers)) if len(powers) > 1 else 1.0
        score = 1.0 - h / hmax
        peak_k = max(range(len(powers)), key=lambda i: powers[i]) + 1
        # cross-engine floor rounding (common.rnd's rule)
        out.append(
            (
                etype,
                n,
                math.floor(score * 10000 + 0.5) / 10000,
                math.floor(n / peak_k * 100 + 0.5) / 100,
            )
        )
    return spark.createDataFrame(
        out,
        "event_type string, days long, forecastability double, "
        "dominant_period_days double",
    )


@query(
    "ml_fair_thresholds",
    # Real oracle: the per-group threshold is the sorted positives'
    # element at index int((1-target)*len(pos)) (clamped) — one
    # ROW_NUMBER pick per group; TPR/FPR are >= threshold counts over
    # identical sigmoid doubles, so every comparison agrees bitwise.
    oracle=f"""
    WITH e AS (SELECT 1.0 / (1.0 + EXP(-CAST(embedding[1] AS DOUBLE)))
                 AS p,
                      label % 2 AS grp,
                      (label // 2) % 2 AS y
               FROM embeddings),
    np AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS pos
           FROM e WHERE y = 1 GROUP BY grp),
    thr AS (SELECT s.grp, s.p AS thr FROM (
              SELECT e.grp, e.p,
                     ROW_NUMBER() OVER (PARTITION BY e.grp
                                        ORDER BY e.p) AS rn
              FROM e WHERE e.y = 1) s
            JOIN np ON np.grp = s.grp
            WHERE s.rn = GREATEST(1, LEAST(np.pos,
              CAST(FLOOR((1 - {FAIR_TPR_TARGET}) * np.pos) AS BIGINT) + 1))),
    agg AS (SELECT e.grp,
                   SUM(CASE WHEN e.y = 1 AND e.p >= t.thr
                            THEN 1 ELSE 0 END) AS tp,
                   SUM(CASE WHEN e.y = 1 THEN 1 ELSE 0 END) AS pos,
                   SUM(CASE WHEN e.y = 0 AND e.p >= t.thr
                            THEN 1 ELSE 0 END) AS fp,
                   SUM(CASE WHEN e.y = 0 THEN 1 ELSE 0 END) AS neg,
                   MAX(t.thr) AS thr
            FROM e JOIN thr t ON e.grp = t.grp GROUP BY e.grp)
    SELECT CAST(grp AS BIGINT) AS grp,
           FLOOR(thr * 10000 + 0.5) / 10000 AS threshold,
           FLOOR(CAST(tp AS DOUBLE) / pos * 10000 + 0.5) / 10000
             AS achieved_tpr,
           CASE WHEN neg > 0
                THEN FLOOR(CAST(fp AS DOUBLE) / neg * 10000 + 0.5) / 10000
                ELSE 0.0 END AS fpr,
           CAST(pos AS BIGINT) AS positives,
           CAST(neg AS BIGINT) AS negatives
    FROM agg ORDER BY grp
    """,
)
def ml_fair_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-opportunity threshold solver: for each group (label
    parity stands in for a protected attribute; score = sigmoid of
    embedding dim 1), find the score threshold whose group TPR hits
    {t:.0%} — the post-processing fix for unequal TPRs at a shared
    threshold. Reports each group's solved threshold, achieved TPR,
    and the resulting FPR (the quantity that MOVES when you equalize
    TPR — no free lunch, and this row shows the price).

    Scale: the per-group threshold is an exact order statistic pulled
    distributed — ``global_rank`` range-partitions the positives on
    (grp, p) (no single-task sort), a broadcast per-group offset turns
    the global rank into a within-group ROW_NUMBER, and one filter
    picks each group's target-quantile score (|groups| rows). TPR/FPR
    are a single conditional aggregation against the broadcast
    threshold frame — nothing data-sized ever reaches the driver."""
    from mister_spark.functions.ranks import global_rank

    emb = cat(spark, sf_dir)["embeddings"].select(
        (1.0 / (1.0 + F.exp(-F.col("embedding")[0].cast("double")))).alias(
            "p"
        ),
        (F.col("label") % 2).alias("grp"),
        (F.floor(F.col("label") / 2) % 2).alias("y"),
    ).localCheckpoint()
    # Per-group positive counts (|groups| rows) and the target rank:
    # rn = clamp(floor((1 - target) * pos) + 1, 1, pos) — identical to
    # the oracle's ROW_NUMBER pick.
    np_counts = (
        emb.filter(F.col("y") == 1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("pos"))
    )
    w_off = W.orderBy("grp").rowsBetween(W.unboundedPreceding, -1)
    np_counts = np_counts.withColumn(
        "grp_off", F.coalesce(F.sum("pos").over(w_off), F.lit(0))
    ).withColumn(
        "rn_target",
        F.greatest(
            F.lit(1),
            F.least(
                F.col("pos"),
                F.floor(F.lit(1 - FAIR_TPR_TARGET) * F.col("pos"))
                .cast("long")
                + 1,
            ),
        ),
    )
    # Exact within-group ROW_NUMBER over p without a single-task sort:
    # global rank on the total order (grp, p, tiebreak), minus the
    # broadcast count of earlier groups. Ties on p are rank-arbitrary
    # but VALUE-stable — the picked score is the same either way.
    pos_ranked = global_rank(
        emb.filter(F.col("y") == 1).withColumn(
            "_tb", F.monotonically_increasing_id()
        ),
        "grp",
        "p",
        "_tb",
    )
    thr = (
        pos_ranked.join(F.broadcast(np_counts), "grp")
        .filter(F.col("rk") - F.col("grp_off") == F.col("rn_target"))
        .select("grp", F.col("p").alias("thr"))
    )
    # One conditional aggregation over the scored frame vs the
    # broadcast |groups|-row threshold table.
    agg = (
        emb.join(F.broadcast(thr), "grp")
        .groupBy("grp")
        .agg(
            F.sum(
                F.when((F.col("y") == 1) & (F.col("p") >= F.col("thr")), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("pos"),
            F.sum(
                F.when((F.col("y") == 0) & (F.col("p") >= F.col("thr")), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("neg"),
            F.max("thr").alias("thr"),
        )
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return agg.select(
        F.col("grp").cast("long").alias("grp"),
        r4(F.col("thr")).alias("threshold"),
        r4(F.col("tp").cast("double") / F.col("pos")).alias("achieved_tpr"),
        F.when(
            F.col("neg") > 0, r4(F.col("fp").cast("double") / F.col("neg"))
        )
        .otherwise(F.lit(0.0))
        .alias("fpr"),
        F.col("pos").cast("long").alias("positives"),
        F.col("neg").cast("long").alias("negatives"),
    ).orderBy("grp")


ml_fair_thresholds.__doc__ = ml_fair_thresholds.__doc__.format(
    t=FAIR_TPR_TARGET
)
