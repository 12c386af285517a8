"""Wave 254: ordinal effect size, calibration testing, temperature fit.

stat_cliff_delta measures HOW MUCH urgent orders' prices dominate the
rest — δ = (#{x>y} − #{x<y}) / (n1·n2) over all cross pairs, computed
exactly from collapsed value counts and prefix sums (never the
quadratic pair set): the ordinal effect size that stays meaningful
when means and variances lie (heavy tails, outliers), with the
conventional negligible/small/medium/large banding.
stat_hosmer_lemeshow runs the classic goodness-of-calibration test on
the sigmoid score ml_calibration_bins bins: exact score deciles via
the two-phase global rank (no single-task NTILE), per-decile observed
vs expected positives, and the HL chi-square whose inflation says the
score is mis-calibrated even when AUC looks fine.
ml_temperature_scaling then FIXES what HL flags: the one-parameter
post-hoc calibration (divide logits by T, refit nothing else) solved
by a fixed 6-step Newton iteration on the NLL — the modern-classifier
recipe, and the iteration replays exactly in the oracle because every
step is one aggregate over the same frame.

Exactness: cross-pair counts are integer prefix-sum products; decile
assignment is the exact arithmetic NTILE both engines derive from the
same total order; the Newton iterates round to 1e-9 per step on
identical double operands, the ev_holt_smoothing pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum, global_rank, ntile_from_rank
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

TS_ITERS = 6  # Newton steps for the temperature fit
HL_BINS = 10


@query(
    "stat_cliff_delta",
    # Real oracle: identical collapsed (value, group) counts; #{x>y}
    # accumulates a_v * cum_b(<v) via an ordered prefix window — the
    # O(|distinct|) identity for the quadratic pair count.
    oracle="""
    WITH v AS (SELECT CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS g,
                      o_totalprice AS x
               FROM orders),
    cnt AS (SELECT x,
                   CAST(SUM(g) AS BIGINT) AS a,
                   CAST(SUM(1 - g) AS BIGINT) AS b
            FROM v GROUP BY 1),
    cum AS (SELECT x, a, b,
                   COALESCE(SUM(b) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS b_below,
                   COALESCE(SUM(a) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS a_below
            FROM cnt),
    s AS (SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
                 CAST(SUM(a * b_below) AS BIGINT) AS gt,
                 CAST(SUM(b * a_below) AS BIGINT) AS lt,
                 CAST(SUM(a * b) AS BIGINT) AS ties
          FROM cum)
    SELECT n1, n2, gt, lt, ties,
           FLOOR((CAST(gt AS DOUBLE) - lt) / (CAST(n1 AS DOUBLE) * n2)
                 * 1000000 + 0.5) / 1000000 AS delta,
           CASE WHEN ABS((CAST(gt AS DOUBLE) - lt)
                         / (CAST(n1 AS DOUBLE) * n2)) < 0.147
                     THEN 'negligible'
                WHEN ABS((CAST(gt AS DOUBLE) - lt)
                         / (CAST(n1 AS DOUBLE) * n2)) < 0.33
                     THEN 'small'
                WHEN ABS((CAST(gt AS DOUBLE) - lt)
                         / (CAST(n1 AS DOUBLE) * n2)) < 0.474
                     THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM s
    """,
)
def stat_cliff_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between urgent and non-urgent order prices:
    δ = (#{x>y} − #{x<y}) / (n1·n2) over all cross-group pairs —
    the ordinal effect size (scale-free, outlier-immune) that says how
    OFTEN one group beats the other, where stat_cohens_d's
    standardized mean difference can be dragged anywhere by one fat
    tail. Conventional banding: |δ| < .147 negligible, < .33 small,
    < .474 medium, else large.

    Scale: the quadratic pair count collapses to one prefix sum over
    the |distinct prices| frame — value-group counts (one shuffle) +
    an ordered carry, never the n1×n2 pair set."""
    v = cat(spark, sf_dir)["orders"].select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("g"),
        F.col("o_totalprice").alias("x"),
    )
    cnt = v.groupBy("x").agg(
        F.sum("g").cast("bigint").alias("a"),
        F.sum(1 - F.col("g")).cast("bigint").alias("b"),
    )
    cum = bucketed_cumsum(
        cnt,
        "x",
        {"ca": F.col("a"), "cb": F.col("b")},
    ).select(
        "x",
        "a",
        "b",
        (F.col("cb") - F.col("b")).alias("b_below"),
        (F.col("ca") - F.col("a")).alias("a_below"),
    )
    s = cum.agg(
        F.sum("a").cast("bigint").alias("n1"),
        F.sum("b").cast("bigint").alias("n2"),
        F.sum(F.col("a") * F.col("b_below")).cast("bigint").alias("gt"),
        F.sum(F.col("b") * F.col("a_below")).cast("bigint").alias("lt"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("ties"),
    )
    delta = (F.col("gt").cast("double") - F.col("lt")) / (
        F.col("n1").cast("double") * F.col("n2")
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return s.select(
        "n1",
        "n2",
        "gt",
        "lt",
        "ties",
        r6(delta).alias("delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@query(
    "stat_hosmer_lemeshow",
    # Real oracle: NTILE(10) over the identical total order (p,
    # vec_id) — the arithmetic tile rule both engines share — then
    # integer observed vs summed expected per decile and the HL
    # chi-square.
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      1.0 / (1.0 + EXP(-(CAST(embedding[1] AS DOUBLE)
                            + 1.5 * (2 * ((label // 2) % 2) - 1)))) AS p,
                      (label // 2) % 2 AS y
               FROM embeddings),
    b AS (SELECT *, NTILE({HL_BINS}) OVER (ORDER BY p, vec_id) AS bin
          FROM e),
    g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS obs,
                 SUM(p) AS expd
          FROM b GROUP BY 1),
    hl AS (SELECT SUM((obs - expd) * (obs - expd)
                      / (expd * (1.0 - expd / n))) AS h
           FROM g)
    SELECT g.bin, g.n, g.obs,
           FLOOR(g.expd * 10000 + 0.5) / 10000 AS expected,
           FLOOR(CAST(g.obs AS DOUBLE) / g.n * 10000 + 0.5) / 10000
             AS obs_rate,
           FLOOR(hl.h * 10000 + 0.5) / 10000 AS hl_chi2,
           CAST({HL_BINS} - 2 AS BIGINT) AS df
    FROM g CROSS JOIN hl ORDER BY g.bin
    """,
)
def stat_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer–Lemeshow calibration test on an informative sigmoid score
    (embedding dim 1 shifted ±1.5 by label bit 1 — a classifier-like
    separated score): exact score deciles, per
    decile observed vs expected positives, and the HL chi-square
    (df = bins−2) every row carries — the formal 'are the
    probabilities honest?' test behind ml_calibration_bins' visual,
    and the alarm ml_temperature_scaling exists to silence.

    Scale: the decile assignment is the arithmetic NTILE derived from
    global_rank (range-partitioned two-phase rank — no single-task
    sorted window); the rest is one 10-row grouped pass."""
    y = F.floor(F.col("label") / 2) % 2
    z = F.col("embedding")[0].cast("double") + 1.5 * (2 * y - 1)
    e = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        (1.0 / (1.0 + F.exp(-z))).alias("p"),
        y.alias("y"),
    )
    # checkpoint: the ranked frame feeds the total count AND the bin
    # assignment — without it both branches replay the two-phase rank
    ranked = global_rank(e, "p", "vec_id").localCheckpoint()
    n_tot = ranked.agg(F.count(F.lit(1)).alias("nt"))
    b = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "bin", ntile_from_rank(F.col("rk"), F.col("nt"), HL_BINS)
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("obs"),
        F.sum("p").alias("expd"),
    )
    hl = g.agg(
        F.sum(
            (F.col("obs") - F.col("expd"))
            * (F.col("obs") - F.col("expd"))
            / (F.col("expd") * (1.0 - F.col("expd") / F.col("n")))
        ).alias("h")
    )
    return (
        g.crossJoin(F.broadcast(hl))
        .select(
            "bin",
            "n",
            "obs",
            rnd(F.col("expd"), 4).alias("expected"),
            rnd(F.col("obs").cast("double") / F.col("n"), 4).alias(
                "obs_rate"
            ),
            rnd(F.col("h"), 4).alias("hl_chi2"),
            F.lit(HL_BINS - 2).cast("bigint").alias("df"),
        )
        .orderBy("bin")
    )


_TS_SQL = f"""
WITH RECURSIVE e AS (SELECT CAST(embedding[1] AS DOUBLE)
                            + 1.5 * (2 * ((label // 2) % 2) - 1) AS z,
                            CAST((label // 2) % 2 AS DOUBLE) AS y
                     FROM embeddings),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
newton(it, u) AS (
  SELECT 0, CAST(1.0 AS DOUBLE)
  UNION ALL
  SELECT w.it + 1,
         FLOOR((w.u - s.g / s.h) * 1000000000 + 0.5) / 1000000000
  FROM newton w,
       LATERAL (SELECT SUM(e.z * (1.0 / (1.0 + EXP(-w.u * e.z)) - e.y))
                         AS g,
                       SUM(e.z * e.z * (1.0 / (1.0 + EXP(-w.u * e.z)))
                           * (1.0 - 1.0 / (1.0 + EXP(-w.u * e.z)))) AS h
                FROM e) s
  WHERE w.it < {TS_ITERS}
),
uf AS (SELECT u FROM newton WHERE it = {TS_ITERS}),
nll AS (SELECT
          SUM(-(e.y * LN(1.0 / (1.0 + EXP(-e.z)))
                + (1.0 - e.y) * LN(1.0 - 1.0 / (1.0 + EXP(-e.z)))))
            AS before,
          SUM(-(e.y * LN(1.0 / (1.0 + EXP(-uf.u * e.z)))
                + (1.0 - e.y) * LN(1.0 - 1.0 / (1.0 + EXP(-uf.u * e.z)))))
            AS after
        FROM e CROSS JOIN uf)
SELECT FLOOR(1.0 / uf.u * 10000 + 0.5) / 10000 AS temperature,
       FLOOR(nll.before / n.n * 1000000 + 0.5) / 1000000 AS nll_before,
       FLOOR(nll.after / n.n * 1000000 + 0.5) / 1000000 AS nll_after,
       CAST(n.n AS BIGINT) AS n
FROM uf CROSS JOIN nll CROSS JOIN n
"""


@query("ml_temperature_scaling", oracle=_TS_SQL)
def ml_temperature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature scaling of the classifier-like logit (embedding dim 1
    shifted ±1.5 by label bit 1): find T minimizing the NLL of σ(z/T) by {i}
    Newton steps on u = 1/T (gradient Σ z(σ(uz) − y), curvature
    Σ z²σ(1−σ)) — the one-parameter post-hoc calibration that fixes
    what stat_hosmer_lemeshow flags without touching ranking (AUC is
    invariant). Reports T and the per-example NLL before/after — the
    honest 'did calibration actually improve?' pair.

    Scale: each Newton step is ONE aggregate over the scored frame
    with the scalar state broadcast — {i} passes total, the model (a
    single double) never grows; iterates round to 1e-9 so both
    engines walk the identical path."""
    import math

    yb = F.floor(F.col("label") / 2) % 2
    e = cat(spark, sf_dir)["embeddings"].select(
        (F.col("embedding")[0].cast("double") + 1.5 * (2 * yb - 1)).alias(
            "z"
        ),
        yb.cast("double").alias("y"),
    ).localCheckpoint()
    u = 1.0
    for _ in range(TS_ITERS):
        sig = 1.0 / (1.0 + F.exp(-F.lit(u) * F.col("z")))
        row = e.agg(
            F.sum(F.col("z") * (sig - F.col("y"))).alias("g"),
            F.sum(F.col("z") * F.col("z") * sig * (1.0 - sig)).alias("h"),
        ).collect()[0]
        u = math.floor((u - row["g"] / row["h"]) * 1e9 + 0.5) / 1e9
    sig0 = 1.0 / (1.0 + F.exp(-F.col("z")))
    sigt = 1.0 / (1.0 + F.exp(-F.lit(u) * F.col("z")))
    out = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            -(
                F.col("y") * F.log(sig0)
                + (1.0 - F.col("y")) * F.log(1.0 - sig0)
            )
        ).alias("before"),
        F.sum(
            -(
                F.col("y") * F.log(sigt)
                + (1.0 - F.col("y")) * F.log(1.0 - sigt)
            )
        ).alias("after"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return out.select(
        rnd(F.lit(1.0 / u), 4).alias("temperature"),
        r6(F.col("before") / F.col("n")).alias("nll_before"),
        r6(F.col("after") / F.col("n")).alias("nll_after"),
        F.col("n").cast("bigint").alias("n"),
    )


ml_temperature_scaling.__doc__ = ml_temperature_scaling.__doc__.format(
    i=TS_ITERS
)
