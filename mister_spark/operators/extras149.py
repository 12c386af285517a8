"""Wave 149: simultaneous multinomial intervals and edge surprise.

stat_multinomial_ci puts SIMULTANEOUS (Goodman/Bonferroni-adjusted)
confidence intervals on all five priority shares at once — the
correction that keeps 'look at all the categories' from
manufacturing a significant one; graph_edge_surprise scores each
co-purchase edge against the degree-preserving configuration-model
expectation d_u·d_v/(2m) — the edges that exist far in excess of
what popularity alone predicts are the real product affinities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.registry import query

MCI_Z = 2.5758  # Bonferroni z for 5 simultaneous 95% intervals
SURPRISE_TOP = 15


@query(
    "stat_multinomial_ci",
    oracle=f"""
    WITH g AS (SELECT o_orderpriority AS cat,
                      CAST(COUNT(*) AS DOUBLE) AS k
               FROM orders GROUP BY 1),
    t AS (SELECT SUM(k) AS n FROM g),
    w AS (SELECT g.cat, g.k, t.n, g.k / t.n AS p,
                 ({MCI_Z} * {MCI_Z}) / t.n AS z2n
          FROM g, t)
    SELECT cat AS priority,
           CAST(k AS BIGINT) AS orders,
           FLOOR(p * 10000 + 0.5) / 10000 AS share,
           FLOOR((p + z2n / 2 - {MCI_Z} * SQRT(p * (1 - p) / n
                                               + z2n * z2n / 4))
                 / (1 + z2n) * 10000 + 0.5) / 10000 AS ci_lo,
           FLOOR((p + z2n / 2 + {MCI_Z} * SQRT(p * (1 - p) / n
                                               + z2n * z2n / 4))
                 / (1 + z2n) * 10000 + 0.5) / 10000 AS ci_hi
    FROM w
    """,
)
def stat_multinomial_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simultaneous multinomial confidence intervals for the five
    priority shares: Wilson-form intervals at the Bonferroni-adjusted
    z = {z} so ALL FIVE hold jointly at 95% — the correct bars for a
    category chart that someone will scan for the biggest bucket.
    Five marginal 95% CIs would jointly fail ~23% of the time; these
    don't.

    Scale: one rollup to 5 rows; the intervals are per-row
    closed-form."""
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy(F.col("o_orderpriority").alias("cat"))
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
    )
    t = g.agg(F.sum("k").alias("n"))
    w = g.crossJoin(F.broadcast(t)).withColumn(
        "p", F.col("k") / F.col("n")
    ).withColumn("z2n", (MCI_Z * MCI_Z) / F.col("n"))
    half = MCI_Z * F.sqrt(
        F.col("p") * (1 - F.col("p")) / F.col("n")
        + F.col("z2n") * F.col("z2n") / 4
    )
    center = F.col("p") + F.col("z2n") / 2
    return w.select(
        F.col("cat").alias("priority"),
        F.col("k").cast("bigint").alias("orders"),
        ratio(F.col("p")).alias("share"),
        ratio((center - half) / (1 + F.col("z2n"))).alias("ci_lo"),
        ratio((center + half) / (1 + F.col("z2n"))).alias("ci_hi"),
    )


stat_multinomial_ci.__doc__ = stat_multinomial_ci.__doc__.format(z=MCI_Z)


@query(
    "graph_edge_surprise",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    sym AS (SELECT p1 AS u, w FROM e UNION ALL SELECT p2, w FROM e),
    deg AS (SELECT u, SUM(w) AS d FROM sym GROUP BY 1),
    m AS (SELECT SUM(w) AS m FROM e),
    s AS (SELECT e.p1, e.p2, e.w,
                 da.d * db.d / (2 * m.m) AS expected
          FROM e JOIN deg da ON e.p1 = da.u
                 JOIN deg db ON e.p2 = db.u, m)
    SELECT p1, p2, CAST(w AS BIGINT) AS weight,
           FLOOR(expected * 10000 + 0.5) / 10000 AS expected_weight,
           FLOOR(w / expected * 10000 + 0.5) / 10000 AS surprise
    FROM s
    ORDER BY FLOOR(w / expected * 10000 + 0.5) / 10000 DESC, p1, p2
    LIMIT {SURPRISE_TOP}
    """,
)
def graph_edge_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge surprise under the configuration-model null: each
    co-purchase edge's weight against d_u·d_v/(2m) — what pure
    popularity would produce with the same degree sequence. High
    surprise = genuine affinity (the modularity numerator per edge);
    surprise ≈ 1 = two bestsellers coincidentally sharing baskets.
    Top-{k} reported, rounded-then-ranked for cross-engine order.

    Scale: degrees and 2m are small broadcasts over the capped edge
    list; the score is per-edge arithmetic and the top-k a
    TakeOrdered."""
    e = _copurchase_edges(spark, sf_dir).withColumn(
        "w", F.col("w").cast("double")
    ).localCheckpoint()
    sym = e.select(F.col("p1").alias("u"), "w").unionByName(
        e.select(F.col("p2").alias("u"), "w")
    )
    deg = sym.groupBy("u").agg(F.sum("w").alias("d"))
    m = e.agg(F.sum("w").alias("m"))
    s = (
        e.join(
            F.broadcast(deg.select(F.col("u").alias("p1"),
                                   F.col("d").alias("da"))), "p1"
        )
        .join(
            F.broadcast(deg.select(F.col("u").alias("p2"),
                                   F.col("d").alias("db"))), "p2"
        )
        .crossJoin(F.broadcast(m))
        .withColumn(
            "expected", F.col("da") * F.col("db") / (2 * F.col("m"))
        )
        .withColumn("surprise", ratio(F.col("w") / F.col("expected")))
    )
    return (
        s.orderBy(F.col("surprise").desc(), "p1", "p2")
        .limit(SURPRISE_TOP)
        .select(
            "p1",
            "p2",
            F.col("w").cast("bigint").alias("weight"),
            ratio(F.col("expected")).alias("expected_weight"),
            "surprise",
        )
    )


graph_edge_surprise.__doc__ = graph_edge_surprise.__doc__.format(
    k=SURPRISE_TOP
)
