"""Wave 139: skyline queries and local differential privacy.

sql_skyline_2d is the classic SKYLINE operator — orders not
dominated on (price, recency) by any other order — computed with the
sort-free prefix-max construction instead of the naive O(n²)
dominance join; ds_randomized_response is the LOCAL differential
privacy mechanism (each row flips a coin before answering) with the
debiased population estimate next to the truth — the per-user
privacy guarantee that central DP (ds_dp_noisy_counts) doesn't give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

RR_P_TRUTH = 75  # % chance of answering truthfully


@query(
    "sql_skyline_2d",
    oracle="""
    WITH d AS (SELECT o_orderkey, o_totalprice,
                      CAST(date_diff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT)
                        AS day
               FROM orders),
    dm AS (SELECT day, MAX(o_totalprice) AS day_max FROM d GROUP BY 1),
    pm AS (SELECT day,
                  MAX(day_max) OVER (ORDER BY day DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS later_max
           FROM dm),
    sky AS (SELECT d.o_orderkey, d.o_totalprice, d.day
            FROM d JOIN pm ON d.day = pm.day
            WHERE pm.later_max IS NULL OR d.o_totalprice > pm.later_max)
    SELECT o_orderkey,
           FLOOR(o_totalprice * 100 + 0.5) / 100 AS price,
           day
    FROM sky
    """,
)
def sql_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (higher price, more recent date) by any other order — 'the best
    trade-offs', the operator behind shortlists and frontier
    dashboards. Computed WITHOUT the naive O(n²) dominance join: a
    point survives iff its price exceeds the max price of all
    STRICTLY LATER days — a per-day max rollup plus a prefix max
    over the calendar-bounded day frame, then one join back.

    Scale: the rollup is one shuffle; the prefix max rides the
    |days| frame (control-chart precedent); the verification join is
    an equi-join on day. The same construction generalizes per
    group for grouped skylines."""
    d = cat(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_totalprice",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
    )
    dm = d.groupBy("day").agg(F.max("o_totalprice").alias("day_max"))
    w = W.orderBy(F.col("day").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    pm = dm.select(
        "day", F.max("day_max").over(w).alias("later_max")
    )
    sky = d.join(pm, "day").filter(
        F.col("later_max").isNull()
        | (F.col("o_totalprice") > F.col("later_max"))
    )
    return sky.select(
        "o_orderkey",
        money(F.col("o_totalprice")).alias("price"),
        "day",
    )


@query(
    "ds_randomized_response",
    oracle=f"""
    WITH d AS (SELECT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS truth,
                      CASE WHEN (c_custkey * {FP_MUL} + 31) % {FP_MOD} % 100
                                < {RR_P_TRUTH}
                           THEN 1 ELSE 0 END AS honest,
                      CASE WHEN (c_custkey * {FP_MUL} + 37) % {FP_MOD} % 2
                                = 1
                           THEN 1 ELSE 0 END AS coin
               FROM customer),
    r AS (SELECT truth,
                 CASE WHEN honest = 1 THEN truth ELSE coin END AS response
          FROM d),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(CAST(response AS DOUBLE)) AS p_obs,
                 AVG(CAST(truth AS DOUBLE)) AS p_true
          FROM r)
    SELECT CAST(n AS BIGINT) AS respondents,
           FLOOR(p_obs * 10000 + 0.5) / 10000 AS observed_rate,
           FLOOR((p_obs - (1 - {RR_P_TRUTH} / 100.0) * 0.5)
                 / ({RR_P_TRUTH} / 100.0) * 10000 + 0.5) / 10000
             AS debiased_estimate,
           FLOOR(p_true * 10000 + 0.5) / 10000 AS true_rate
    FROM s
    """,
)
def ds_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (local DP): each customer answers the
    sensitive question 'is your balance negative?' truthfully with
    p = {p}% and otherwise flips a fair coin — no individual answer
    reveals their truth, yet p̂_true = (p̂_obs − (1−p)/2)/p recovers
    the population rate. The truth ships alongside (it wouldn't in
    production — that's the point) so the debiasing is auditable.
    Deterministic portable 'randomness' makes the whole mechanism
    oracle-replayable.

    Scale: per-row arithmetic + one aggregate — the mechanism adds
    zero shuffles."""
    c = cat(spark, sf_dir)["customer"]
    truth = F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
    honest = (
        (F.col("c_custkey") * FP_MUL + 31) % FP_MOD % 100 < RR_P_TRUTH
    )
    coin = ((F.col("c_custkey") * FP_MUL + 37) % FP_MOD % 2 == 1).cast(
        "int"
    )
    r = c.select(
        truth.alias("truth"),
        F.when(honest, truth).otherwise(coin).alias("response"),
    )
    p = RR_P_TRUTH / 100.0
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("respondents"),
        F.avg(F.col("response").cast("double")).alias("p_obs"),
        F.avg(F.col("truth").cast("double")).alias("p_true"),
    )
    return s.select(
        "respondents",
        ratio(F.col("p_obs")).alias("observed_rate"),
        ratio((F.col("p_obs") - (1 - p) * 0.5) / p).alias(
            "debiased_estimate"
        ),
        ratio(F.col("p_true")).alias("true_rate"),
    )


ds_randomized_response.__doc__ = ds_randomized_response.__doc__.format(
    p=RR_P_TRUTH
)
