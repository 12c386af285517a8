"""Wave 262: Cox calibration regression — the slope/intercept verdict.

ml_cox_calibration completes the calibration triad: where
stat_hosmer_lemeshow says WHETHER the probabilities are honest and
ml_temperature_scaling applies the 1-parameter fix, the Cox
recalibration regression says HOW they are wrong — fit
logit(P(y=1)) = a + b·logit(p) by Newton-Raphson logistic regression
on the score's own logit. Perfect calibration is (a, b) = (0, 1);
b < 1 is overconfidence (predictions too extreme — temperature
scaling's case), b > 1 underconfidence, a ≠ 0 base-rate drift that no
temperature can fix. Each Newton step is one aggregate building the
2×2 Fisher information and gradient, solved in closed form and
replayed step-for-step in the oracle's recursion.

Exactness: the {i} Newton iterates round to 1e-9 on identical double
operands (the ml_temperature_scaling pattern); the 2×2 solve is
Cramer's rule over the same sums in both engines; outputs round at
1e-4/1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

CC_ITERS = 6

# score construction shared with stat_hosmer_lemeshow /
# ml_temperature_scaling: an informative, deliberately miscalibrated
# sigmoid score (logit = dim-1 value shifted ±1.5 by label bit 1)
_CC_Z = "(CAST(embedding[1] AS DOUBLE) + 1.5 * (2 * ((label // 2) % 2) - 1))"

_CC_SQL = f"""
WITH RECURSIVE e AS (SELECT {_CC_Z} AS z,
                            CAST((label // 2) % 2 AS DOUBLE) AS y
                     FROM embeddings),
newton(it, a, b) AS (
  SELECT 0, CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
  UNION ALL
  SELECT w.it + 1,
         FLOOR((w.a - ( s.hbb * s.ga - s.hab * s.gb)
                      / (s.haa * s.hbb - s.hab * s.hab))
               * 1000000000 + 0.5) / 1000000000,
         FLOOR((w.b - (-s.hab * s.ga + s.haa * s.gb)
                      / (s.haa * s.hbb - s.hab * s.hab))
               * 1000000000 + 0.5) / 1000000000
  FROM newton w,
       LATERAL (SELECT
           SUM(1.0 / (1.0 + EXP(-(w.a + w.b * e.z))) - e.y) AS ga,
           SUM(e.z * (1.0 / (1.0 + EXP(-(w.a + w.b * e.z))) - e.y))
             AS gb,
           SUM((1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))
               * (1.0 - 1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))) AS haa,
           SUM(e.z * (1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))
               * (1.0 - 1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))) AS hab,
           SUM(e.z * e.z * (1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))
               * (1.0 - 1.0 / (1.0 + EXP(-(w.a + w.b * e.z))))) AS hbb
        FROM e) s
  WHERE w.it < {CC_ITERS}
),
bf AS (SELECT a, b FROM newton WHERE it = {CC_ITERS}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
SELECT FLOOR(bf.a * 10000 + 0.5) / 10000 AS intercept,
       FLOOR(bf.b * 10000 + 0.5) / 10000 AS slope,
       CAST(CASE WHEN bf.b < 0.9 THEN 'overconfident'
            WHEN bf.b > 1.1 THEN 'underconfident'
            ELSE 'calibrated_slope' END AS VARCHAR) AS verdict,
       n.n
FROM bf CROSS JOIN n
"""


@query("ml_cox_calibration", oracle=_CC_SQL)
def ml_cox_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox calibration regression on the classifier-like score the
    calibration triad shares: fit logit(P(y=1)) = a + b·logit(p) by
    {i} Newton steps (gradient and 2×2 Fisher information from one
    aggregate per step, Cramer-solved). (a, b) = (0, 1) is perfect;
    b < 1 says the score is overconfident — the regime
    ml_temperature_scaling's T > 1 corrects; a ≠ 0 is base-rate
    drift no temperature can fix. The HOW-wrong companion to
    stat_hosmer_lemeshow's whether-wrong chi².

    Scale: each Newton step is ONE aggregate over the scored frame
    with the 2-double state broadcast ({i} passes); iterates round to
    1e-9 so both engines walk the identical path."""
    import math

    yb = F.floor(F.col("label") / 2) % 2
    e = cat(spark, sf_dir)["embeddings"].select(
        (F.col("embedding")[0].cast("double") + 1.5 * (2 * yb - 1)).alias(
            "z"
        ),
        yb.cast("double").alias("y"),
    ).localCheckpoint()
    a, b = 0.0, 1.0
    for _ in range(CC_ITERS):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z"))))
        w = p * (1.0 - p)
        row = e.agg(
            F.sum(p - F.col("y")).alias("ga"),
            F.sum(F.col("z") * (p - F.col("y"))).alias("gb"),
            F.sum(w).alias("haa"),
            F.sum(F.col("z") * w).alias("hab"),
            F.sum(F.col("z") * F.col("z") * w).alias("hbb"),
        ).collect()[0]
        det = row["haa"] * row["hbb"] - row["hab"] * row["hab"]
        da = (row["hbb"] * row["ga"] - row["hab"] * row["gb"]) / det
        db = (-row["hab"] * row["ga"] + row["haa"] * row["gb"]) / det
        a = math.floor((a - da) * 1e9 + 0.5) / 1e9
        b = math.floor((b - db) * 1e9 + 0.5) / 1e9
    n = e.count()
    verdict = (
        "overconfident"
        if b < 0.9
        else ("underconfident" if b > 1.1 else "calibrated_slope")
    )
    return spark.createDataFrame(
        [
            (
                math.floor(a * 1e4 + 0.5) / 1e4,
                math.floor(b * 1e4 + 0.5) / 1e4,
                verdict,
                int(n),
            )
        ],
        "intercept double, slope double, verdict string, n long",
    )


ml_cox_calibration.__doc__ = ml_cox_calibration.__doc__.format(i=CC_ITERS)
