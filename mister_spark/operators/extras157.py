"""Wave 157: partition conductance and write-mode semantics.

graph_conductance scores the brand partition by conductance — cut
edges over the smaller side's volume, the bottleneck measure
spectral clustering optimizes (low conductance = a real community
boundary; near the random baseline = an arbitrary slice) — the
complement to graph_modularity's density view; io_write_modes pins
the DataFrameWriter mode matrix (append doubles, overwrite
replaces, ignore no-ops, errorifexists throws) — semantics everyone
half-remembers until a production table doubles.
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
    "graph_conductance",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    be AS (SELECT a.p_brand AS b1, b.p_brand AS b2, e.w
           FROM e JOIN part a ON e.p1 = a.p_partkey
                  JOIN part b ON e.p2 = b.p_partkey),
    brands AS (SELECT DISTINCT b1 AS brand FROM be
               UNION SELECT DISTINCT b2 FROM be),
    vol AS (SELECT brand, SUM(w) AS v FROM (
              SELECT b1 AS brand, w FROM be
              UNION ALL SELECT b2, w FROM be) GROUP BY 1),
    cut AS (SELECT b1 AS brand, SUM(w) AS cw FROM be
            WHERE b1 <> b2 GROUP BY 1),
    tot AS (SELECT SUM(v) AS vt FROM vol),
    phi AS (SELECT vol.brand,
                   COALESCE(cut.cw, 0)
                   / LEAST(vol.v, tot.vt - vol.v) AS cond
            FROM vol LEFT JOIN cut ON vol.brand = cut.brand, tot
            WHERE LEAST(vol.v, tot.vt - vol.v) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS communities,
           FLOOR(AVG(cond) * 10000 + 0.5) / 10000 AS mean_conductance,
           FLOOR(MIN(cond) * 10000 + 0.5) / 10000 AS best_conductance
    FROM phi
    """,
)
def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance of the brand partition on the co-purchase graph:
    per brand, cut-edge weight over min(volume inside, volume
    outside) — the bottleneck score spectral methods minimize. Values
    near 1 (as expected on brand-agnostic baskets) mean the partition
    cuts straight through dense regions; a real community would sit
    far lower. Pairs with graph_modularity: density inside vs
    bottleneck at the boundary.

    Scale: brand lookups broadcast the part dim; cut/volume are
    |brands|-row aggregates over the capped edge list."""
    e = _copurchase_edges(spark, sf_dir).withColumn(
        "w", F.col("w").cast("double")
    )
    part = cat(spark, sf_dir)["part"].select("p_partkey", "p_brand")
    be = (
        e.join(
            F.broadcast(
                part.select(F.col("p_partkey").alias("p1"),
                            F.col("p_brand").alias("b1"))
            ),
            "p1",
        )
        .join(
            F.broadcast(
                part.select(F.col("p_partkey").alias("p2"),
                            F.col("p_brand").alias("b2"))
            ),
            "p2",
        )
        .select("b1", "b2", "w")
        .localCheckpoint()
    )
    vol = (
        be.select(F.col("b1").alias("brand"), "w")
        .unionByName(be.select(F.col("b2").alias("brand"), "w"))
        .groupBy("brand")
        .agg(F.sum("w").alias("v"))
    )
    cut = (
        be.filter(F.col("b1") != F.col("b2"))
        .groupBy(F.col("b1").alias("brand"))
        .agg(F.sum("w").alias("cw"))
    )
    tot = vol.agg(F.sum("v").alias("vt"))
    phi = (
        vol.join(F.broadcast(cut), "brand", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "denom", F.least(F.col("v"), F.col("vt") - F.col("v"))
        )
        .filter(F.col("denom") > 0)
        .withColumn(
            "cond", F.coalesce("cw", F.lit(0.0)) / F.col("denom")
        )
    )
    return phi.agg(
        F.count(F.lit(1)).cast("bigint").alias("communities"),
        ratio(F.avg("cond")).alias("mean_conductance"),
        ratio(F.min("cond")).alias("best_conductance"),
    )


@query(
    "io_write_modes",
    # Real oracle: the mode matrix is a deterministic function of the
    # 100-row base — overwrite keeps n, append doubles it, ignore
    # no-ops, and errorifexists must raise — so the expected counts
    # are a fixed relation over LEAST(100, |orders|).
    oracle="""
    WITH b AS (SELECT CAST(LEAST(100, COUNT(*)) AS BIGINT) AS n
               FROM orders)
    SELECT 'overwrite_fresh' AS mode, b.n AS observed, b.n AS base_rows
    FROM b
    UNION ALL SELECT 'append', 2 * b.n, b.n FROM b
    UNION ALL SELECT 'ignore', 2 * b.n, b.n FROM b
    UNION ALL SELECT 'overwrite_again', b.n, b.n FROM b
    UNION ALL SELECT 'errorifexists_raised', CAST(1 AS BIGINT), b.n FROM b
    """,
)
def io_write_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameWriter mode matrix, executed and measured: overwrite
    replaces (n stays), append doubles, ignore silently no-ops on an
    existing path, and errorifexists raises — each verified by the
    resulting row count (or the caught exception). The semantics
    that, half-remembered, turn an idempotent retry into a doubled
    table.

    Scale: four tiny writes; the audit is the point."""
    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "write_modes_demo")
    shutil.rmtree(loc, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"].limit(100).localCheckpoint()
    base = orders.count()
    rows = []
    orders.write.mode("overwrite").parquet(loc)
    rows.append(("overwrite_fresh", int(spark.read.parquet(loc).count())))
    orders.write.mode("append").parquet(loc)
    rows.append(("append", int(spark.read.parquet(loc).count())))
    orders.write.mode("ignore").parquet(loc)
    rows.append(("ignore", int(spark.read.parquet(loc).count())))
    orders.write.mode("overwrite").parquet(loc)
    rows.append(("overwrite_again", int(spark.read.parquet(loc).count())))
    try:
        orders.write.mode("errorifexists").parquet(loc)
        raised = 0
    except Exception:
        raised = 1
    rows.append(("errorifexists_raised", raised))
    return spark.createDataFrame(
        [(name, n, int(base)) for name, n in rows],
        "mode string, observed long, base_rows long",
    )
