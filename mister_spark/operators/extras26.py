"""Wave 26: the graph-family summary row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

_EDGE_SQL = """
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
"""


@query(
    "graph_summary",
    oracle=f"""
    WITH e AS ({_EDGE_SQL}),
    nodes AS (
      SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS n_nodes
      FROM (SELECT src AS x FROM e UNION SELECT dst FROM e)),
    edges AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
    recip AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
      FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
    SELECT nodes.n_nodes, edges.n_edges,
           FLOOR(CAST(edges.n_edges AS DOUBLE)
                 / (nodes.n_nodes * (nodes.n_nodes - 1)) * 10000 + 0.5) / 10000
             AS density,
           FLOOR(CAST(recip.n_recip AS DOUBLE) / edges.n_edges * 10000 + 0.5)
             / 10000 AS reciprocity
    FROM nodes, edges, recip
    """,
)
def graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed trade-graph summary row: node and edge counts, density
    n_edges/(n·(n−1)), and reciprocity (share of edges whose reverse
    also exists — do trade relationships flow both ways). The header
    stats every graph job logs before choosing its algorithms (density
    picks wedge-join strategies; reciprocity decides whether directed
    and undirected analyses differ at all).

    Scale: the edge derivation is the one data-sized pass
    (checkpointed); counts, the reciprocity self-join, and the ratios
    run on the |edges| frame."""
    from mister_spark.operators.extras9 import _directed_edges

    e = _directed_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("x"))
        .union(e.select("dst"))
        .agg(F.countDistinct("x").alias("n_nodes"))
    )
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"]).agg(F.count(F.lit(1)).alias("n_recip"))
    return (
        nodes.join(F.broadcast(edges))
        .join(F.broadcast(recip))
        .select(
            "n_nodes",
            "n_edges",
            ratio(
                F.col("n_edges").cast("double")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            ).alias("density"),
            ratio(F.col("n_recip").cast("double") / F.col("n_edges")).alias(
                "reciprocity"
            ),
        )
    )
