"""Wave 127: tie-strength analysis, Simpson's-paradox scanning, and
retention planning.

graph_tie_strength computes per-edge neighborhood overlap
(embeddedness) on the co-purchase graph — Granovetter's weak-tie
theory as a query: low-overlap edges are the bridges information
crosses, high-overlap edges are redundant community-internal ties;
stat_simpson_scan checks whether the urgent→fulfilled association
FLIPS sign inside any weekday stratum vs the pooled table — the
automated Simpson's-paradox tripwire; io_retention_plan prices a
date-retention policy: bytes per year partition and the cumulative
reclaim curve for each cutoff.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.registry import query


@query(
    "graph_tie_strength",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    sym AS (SELECT p1 AS u, p2 AS v FROM e
            UNION ALL SELECT p2, p1 FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY 1),
    common AS (SELECT a.u AS p1, b.u AS p2, CAST(COUNT(*) AS DOUBLE) AS cn
               FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
               GROUP BY 1, 2),
    t AS (SELECT e.p1, e.p2,
                 COALESCE(c.cn, 0)
                 / (da.d + db.d - 2 - COALESCE(c.cn, 0)) AS overlap
          FROM e LEFT JOIN common c ON e.p1 = c.p1 AND e.p2 = c.p2
                 JOIN deg da ON e.p1 = da.u
                 JOIN deg db ON e.p2 = db.u
          WHERE da.d + db.d - 2 - COALESCE(c.cn, 0) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS edges,
           FLOOR(AVG(overlap) * 10000 + 0.5) / 10000 AS mean_overlap,
           CAST(SUM(CASE WHEN overlap = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS bridges,
           FLOOR(SUM(CASE WHEN overlap = 0 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS bridge_share
    FROM t
    """,
)
def graph_tie_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie strength (edge embeddedness) on the co-purchase graph:
    per-edge neighborhood overlap |N(u)∩N(v)| / |N(u)∪N(v)∖{{u,v}}|,
    summarized as the mean plus the count of zero-overlap BRIDGES —
    Granovetter's weak ties, the edges whose removal fragments
    information flow (and whose products connect otherwise-separate
    baskets).

    Scale: the common-neighbor counts are the standard wedge join
    (bounded by the basket cap); degrees broadcast; the summary is
    one aggregate over the edge list."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    a = sym.select(F.col("u").alias("p1"), F.col("v").alias("via"))
    b = sym.select(F.col("u").alias("p2"), F.col("v").alias("via"))
    common = (
        a.join(b, "via")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("double").alias("cn"))
    )
    t = (
        e.join(common, ["p1", "p2"], "left")
        .join(
            F.broadcast(deg.select(F.col("u").alias("p1"),
                                   F.col("d").alias("da"))), "p1"
        )
        .join(
            F.broadcast(deg.select(F.col("u").alias("p2"),
                                   F.col("d").alias("db"))), "p2"
        )
        .withColumn("cn", F.coalesce("cn", F.lit(0.0)))
        .withColumn(
            "denom", F.col("da") + F.col("db") - 2 - F.col("cn")
        )
        .filter(F.col("denom") > 0)
        .withColumn("overlap", F.col("cn") / F.col("denom"))
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("edges"),
        ratio(F.avg("overlap")).alias("mean_overlap"),
        F.sum((F.col("overlap") == 0).cast("long"))
        .cast("bigint")
        .alias("bridges"),
        ratio(
            F.sum((F.col("overlap") == 0).cast("double"))
            / F.count(F.lit(1))
        ).alias("bridge_share"),
    )


@query(
    "stat_simpson_scan",
    oracle="""
    WITH d AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS stratum,
                      CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS e,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders),
    s AS (SELECT stratum,
                 CAST(SUM(e * y) AS DOUBLE) + 0.5 AS a,
                 CAST(SUM(e * (1 - y)) AS DOUBLE) + 0.5 AS b,
                 CAST(SUM((1 - e) * y) AS DOUBLE) + 0.5 AS c,
                 CAST(SUM((1 - e) * (1 - y)) AS DOUBLE) + 0.5 AS dd
          FROM d GROUP BY 1),
    pooled AS (SELECT (SUM(a - 0.5) + 0.5) * (SUM(dd - 0.5) + 0.5)
                      / ((SUM(b - 0.5) + 0.5) * (SUM(c - 0.5) + 0.5))
                 AS or_pooled
               FROM s),
    strat AS (SELECT stratum, a * dd / (b * c) AS orr FROM s)
    SELECT CAST((SELECT COUNT(*) FROM strat) AS BIGINT) AS strata,
           FLOOR(pooled.or_pooled * 10000 + 0.5) / 10000 AS pooled_or,
           CAST((SELECT SUM(CASE WHEN (orr > 1) <> (pooled.or_pooled > 1)
                                 THEN 1 ELSE 0 END)
                 FROM strat) AS BIGINT) AS flipped_strata
    FROM pooled
    """,
)
def stat_simpson_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox tripwire: the pooled urgent→fulfilled odds
    ratio (Haldane-corrected) next to the count of weekday strata
    whose within-stratum OR sits on the OTHER side of 1. Zero flips
    means the pooled association is directionally safe to report; any
    flip means stratify first (and stat_mantel_haenszel is the
    estimator to use). On independent synthetic assignments, flips
    are coin-toss noise around weak ORs — the MACHINERY is the
    deliverable.

    Scale: one rollup to 7 stratum contingency rows; everything after
    is 7-row arithmetic."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("stratum"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("e"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    s = d.groupBy("stratum").agg(
        (F.sum(F.col("e") * F.col("y")).cast("double") + 0.5).alias("a"),
        (F.sum(F.col("e") * (1 - F.col("y"))).cast("double") + 0.5).alias(
            "b"
        ),
        (F.sum((1 - F.col("e")) * F.col("y")).cast("double") + 0.5).alias(
            "c"
        ),
        (
            F.sum((1 - F.col("e")) * (1 - F.col("y"))).cast("double") + 0.5
        ).alias("dd"),
    ).localCheckpoint()
    pooled = s.agg(
        (
            (F.sum(F.col("a") - 0.5) + 0.5)
            * (F.sum(F.col("dd") - 0.5) + 0.5)
            / (
                (F.sum(F.col("b") - 0.5) + 0.5)
                * (F.sum(F.col("c") - 0.5) + 0.5)
            )
        ).alias("or_pooled")
    )
    strat = s.withColumn(
        "orr", F.col("a") * F.col("dd") / (F.col("b") * F.col("c"))
    )
    j = strat.crossJoin(F.broadcast(pooled))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("strata"),
        ratio(F.first("or_pooled")).alias("pooled_or"),
        F.sum(
            (
                (F.col("orr") > 1) != (F.col("or_pooled") > 1)
            ).cast("long")
        )
        .cast("bigint")
        .alias("flipped_strata"),
    )


@query("io_retention_plan")  # layout pricing → rows-only
def io_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy pricing: write orders partitioned by year,
    measure bytes per partition, and report the cumulative bytes a
    'keep last N years' policy reclaims for each cutoff — turning a
    retention debate into a sorted table of (cutoff, reclaimed
    bytes, reclaimed share). Deletion by partition drop is O(1)
    metadata; that's why the partition layout IS the retention
    mechanism.

    Scale: one partitioned write; byte accounting is directory
    metadata."""
    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "retention_demo")
    shutil.rmtree(loc, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"].withColumn(
        "yr", F.year("o_orderdate")
    )
    orders.write.partitionBy("yr").mode("overwrite").parquet(loc)
    sizes = {}
    for entry in os.listdir(loc):
        if not entry.startswith("yr="):
            continue
        yr = int(entry.split("=")[1])
        p = os.path.join(loc, entry)
        sizes[yr] = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    total = sum(sizes.values())
    rows = []
    reclaimed = 0
    for yr in sorted(sizes):
        reclaimed += sizes[yr]
        rows.append(
            (
                yr,
                int(sizes[yr]),
                int(reclaimed),
                round(reclaimed / total, 4),
            )
        )
    return spark.createDataFrame(
        rows,
        "drop_through_year long, partition_bytes long, reclaimed_bytes "
        "long, reclaimed_share double",
    )
