"""Wave 160: interval-union busy time and Jarque-Bera normality.

j_interval_union sweeps each supplier's shipping intervals into
their union length — true busy days vs the naive sum that
double-counts overlaps, the utilization number behind capacity
planning; stat_jarque_bera is the classic skewness+kurtosis
normality test with an exact chi-square(2) tail — the gate before
anyone applies a normal-theory method to a metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

EPOCH = "1992-01-01"
NEG_INF = -1000000000


@query(
    "j_interval_union",
    oracle=f"""
    WITH iv AS (SELECT l.l_suppkey AS k,
                       date_diff('day', DATE '{EPOCH}', o.o_orderdate)
                         AS s,
                       date_diff('day', DATE '{EPOCH}', l.l_shipdate)
                         AS e
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey),
    sw AS (SELECT k, s, e,
                  COALESCE(MAX(e) OVER (PARTITION BY k ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), {NEG_INF}) AS pm
           FROM iv),
    per AS (SELECT k,
                   SUM(GREATEST(0, e - GREATEST(s, pm + 1) + 1))
                     AS busy,
                   SUM(e - s + 1) AS naive
            FROM sw GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS suppliers,
           FLOOR(AVG(busy) * 100 + 0.5) / 100 AS avg_busy_days,
           FLOOR(AVG(naive) * 100 + 0.5) / 100 AS avg_naive_days,
           FLOOR(SUM(busy) * 10000.0 / SUM(naive) + 0.5) / 10000
             AS compression,
           CAST(MAX(busy) AS BIGINT) AS max_busy_days
    FROM per
    """,
)
def j_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union busy time per supplier: each lineitem occupies
    [orderdate, shipdate] (order placed to shipped); the sweep line (sorted by start, prior
    running-max end) counts only NEW days, so overlapping shipments
    stop double-counting. Compression — union over naive sum — is
    how much the naive utilization figure overstates reality.

    Scale: the window partitions by suppkey (bounded rows per key —
    no global sort) and the date math is integer epoch-days; the
    final rollup is |suppliers| rows."""
    c = cat(spark, sf_dir)
    iv = (
        c["lineitem"]
        .join(
            c["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("k"),
            F.datediff("o_orderdate", F.lit(EPOCH)).alias("s"),
            F.datediff("l_shipdate", F.lit(EPOCH)).alias("e"),
        )
    )
    w = (
        W.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sw = iv.withColumn(
        "pm", F.coalesce(F.max("e").over(w), F.lit(NEG_INF))
    )
    per = sw.groupBy("k").agg(
        F.sum(
            F.greatest(
                F.lit(0),
                F.col("e")
                - F.greatest(F.col("s"), F.col("pm") + 1)
                + 1,
            )
        ).alias("busy"),
        F.sum(F.col("e") - F.col("s") + 1).alias("naive"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("suppliers"),
        (F.floor(F.avg("busy") * 100 + 0.5) / 100).alias("avg_busy_days"),
        (F.floor(F.avg("naive") * 100 + 0.5) / 100).alias(
            "avg_naive_days"
        ),
        (
            F.floor(F.sum("busy") * 10000.0 / F.sum("naive") + 0.5)
            / 10000
        ).alias("compression"),
        F.max("busy").cast("bigint").alias("max_busy_days"),
    )


@query(
    "stat_jarque_bera",
    oracle="""
    WITH x AS (SELECT LN(o_totalprice) AS v FROM orders),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(v) AS mu FROM x),
    c AS (SELECT m.n,
                 AVG((x.v - m.mu) * (x.v - m.mu)) AS m2,
                 AVG((x.v - m.mu) * (x.v - m.mu) * (x.v - m.mu)) AS m3,
                 AVG((x.v - m.mu) * (x.v - m.mu) * (x.v - m.mu)
                     * (x.v - m.mu)) AS m4
          FROM x, m GROUP BY m.n),
    jb AS (SELECT n,
                  m3 / POW(m2, 1.5) AS skew,
                  m4 / (m2 * m2) AS kurt,
                  n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
                             + POW(m4 / (m2 * m2) - 3, 2) / 4.0) AS stat
           FROM c)
    SELECT FLOOR(skew * 10000 + 0.5) / 10000 AS skewness,
           FLOOR(kurt * 10000 + 0.5) / 10000 AS kurtosis,
           FLOOR(stat * 100 + 0.5) / 100 AS jb_stat,
           FLOOR(EXP(-LEAST(stat, 700) / 2) * 1000000 + 0.5) / 1000000
             AS p_value,
           CASE WHEN EXP(-LEAST(stat, 700) / 2) < 0.05
                THEN 1 ELSE 0 END AS reject_normality
    FROM jb
    """,
)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on log order values: JB =
    n/6·(S² + (K−3)²/4) against chi-square(2), whose survival
    function is EXACTLY exp(−x/2) (even-df closed form — no
    approximation gap between engines). Log-prices are right-skewed
    here, so the test rejects — the honest answer before fitting
    anything Gaussian to them.

    Scale: two passes (mean, then central moments) — both map-side
    combining aggregates; the test is one-row arithmetic."""
    x = cat(spark, sf_dir)["orders"].select(
        F.log("o_totalprice").alias("v")
    )
    m = x.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("v").alias("mu"),
    )
    d = F.col("v") - F.col("mu")
    c = (
        x.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.avg(d * d).alias("m2"),
            F.avg(d * d * d).alias("m3"),
            F.avg(d * d * d * d).alias("m4"),
        )
    )
    skew = F.col("m3") / F.pow("m2", 1.5)
    kurt = F.col("m4") / (F.col("m2") * F.col("m2"))
    stat = (
        F.col("n")
        / 6.0
        * (F.pow(skew, 2) + F.pow(kurt - 3, 2) / 4.0)
    )
    p = F.exp(-F.least(stat, F.lit(700.0)) / 2)
    return c.select(
        ratio(skew).alias("skewness"),
        ratio(kurt).alias("kurtosis"),
        (F.floor(stat * 100 + 0.5) / 100).alias("jb_stat"),
        (F.floor(p * 1000000 + 0.5) / 1000000).alias("p_value"),
        F.when(p < 0.05, 1).otherwise(0).alias("reject_normality"),
    )
