"""Wave 250: graph extent — eccentricity, diameter, radius, center.

graph_diameter computes per-node eccentricity (the longest shortest
path out of each node) on the symmetrized nation trade graph by
min-plus DOUBLING: each round composes the distance frame with itself
(d(u,v) = min over w of d(u,w) + d(w,v)), so {r} rounds cover paths of
up to 2^{r} edges — a guaranteed fixpoint on the <= 25-node nation
graph, and the SAME round count replays in the oracle (the
graph_temporal_reachability lesson: never pair a bounded iteration
with a fixpoint oracle). Diameter = max eccentricity, radius = min,
and the center/periphery flags name the logistics answer the numbers
imply: center nations can reach everyone in radius hops — where you
put the warehouse; periphery nations define the worst case.

Exactness: hop distances are integers under min/+ only, so every
frame is engine-exact at any round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query

DIAM_ROUNDS = 3  # doubling: covers 2^3 = 8-edge paths (diameter << 8)

_DIAM_EDGES = """
    e0 AS (
      SELECT DISTINCT s.s_nationkey AS a, c.c_nationkey AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey),
    e AS (SELECT a, b FROM (SELECT a, b FROM e0
                            UNION SELECT b, a FROM e0)),
    nodes AS (SELECT DISTINCT a AS node FROM e)
"""


@query(
    "graph_diameter",
    # Real oracle: the identical min-plus doubling rounds as a
    # recursive CTE (two self-references compose the working table
    # with itself, the mr_pagerank multiple-self-ref pattern); hop
    # counts are integers, so every round matches bit-for-bit.
    oracle=f"""
    WITH RECURSIVE {_DIAM_EDGES},
    dd(it, u, v, d) AS (
      SELECT 0, u, v, MIN(d) FROM (
        SELECT node AS u, node AS v, CAST(0 AS BIGINT) AS d FROM nodes
        UNION ALL
        SELECT a, b, CAST(1 AS BIGINT) FROM e) base
      GROUP BY u, v
      UNION ALL
      SELECT it + 1, u, v, MIN(d) FROM (
        SELECT x.it, x.u, x.v, x.d FROM dd x WHERE x.it < {DIAM_ROUNDS}
        UNION ALL
        SELECT x.it, x.u, y.v, x.d + y.d
        FROM dd x JOIN dd y ON y.it = x.it AND x.v = y.u
        WHERE x.it < {DIAM_ROUNDS}) q
      GROUP BY it + 1, u, v),
    ecc AS (SELECT u AS node, MAX(d) AS ecc,
                   CAST(COUNT(*) AS BIGINT) AS reached
            FROM dd WHERE it = {DIAM_ROUNDS} GROUP BY 1),
    g AS (SELECT MAX(ecc) AS diameter, MIN(ecc) AS radius FROM ecc)
    SELECT ecc.node, ecc.ecc AS eccentricity,
           g.diameter, g.radius,
           CAST(CASE WHEN ecc.ecc = g.radius THEN 1 ELSE 0 END
                AS BIGINT) AS is_center,
           CAST(CASE WHEN ecc.ecc = g.diameter THEN 1 ELSE 0 END
                AS BIGINT) AS is_periphery,
           ecc.reached
    FROM ecc, g
    """,
)
def graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eccentricity / diameter / radius / center of the symmetrized
    trade graph by min-plus doubling ({r} rounds = 2^{r}-edge paths,
    a fixpoint on the nation graph): ecc(u) = the worst-case hop
    count out of u; center nations (ecc = radius) are where a
    depot/steward minimizes the worst route, periphery nations
    (ecc = diameter) define it. graph_harmonic_centrality averages
    the same distances; this reports their EXTREMES — the SLA view
    instead of the typical-case view.

    Scale: one fact-scan edge rollup (checkpointed); each doubling
    round is one self-join + min-aggregate on the model-sized
    distance frame — log(diameter) rounds, the graph_scc_bowtie
    pattern. Hop counts are integers; both engines run the identical
    round count. Disconnection safety: the op ASSERTS all |nodes|^2
    pairs are reachable at the final round (and emits each node's
    `reached` count), so a disconnected graph or an undersized
    DIAM_ROUNDS raises instead of silently reporting per-component
    extents."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("a"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("b"))
    e0 = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    e = (
        e0.unionByName(
            e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint()  # symmetrized model-sized edge frame
    )
    nodes = e.select(F.col("a").alias("node")).distinct()
    dist = (
        nodes.select(
            F.col("node").alias("u"),
            F.col("node").alias("v"),
            F.lit(0).cast("bigint").alias("d"),
        )
        .unionByName(
            e.select(
                F.col("a").alias("u"),
                F.col("b").alias("v"),
                F.lit(1).cast("bigint").alias("d"),
            )
        )
        .groupBy("u", "v")
        .agg(F.min("d").alias("d"))
        .localCheckpoint()
    )
    for _ in range(DIAM_ROUNDS):
        composed = (
            dist.alias("x")
            .join(
                dist.select(
                    F.col("u").alias("w"),
                    F.col("v").alias("v2"),
                    F.col("d").alias("d2"),
                ),
                F.col("x.v") == F.col("w"),
            )
            .select(
                F.col("x.u").alias("u"),
                F.col("v2").alias("v"),
                (F.col("x.d") + F.col("d2")).alias("d"),
            )
        )
        dist = (
            dist.unionByName(composed)
            .groupBy("u", "v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    ecc = dist.groupBy(F.col("u").alias("node")).agg(
        F.max("d").alias("eccentricity"),
        F.count(F.lit(1)).cast("bigint").alias("reached"),
    )
    # fail LOUDLY on disconnection or round-count truncation: every
    # node must reach every node within 2^DIAM_ROUNDS hops, else
    # eccentricity silently describes each reachable set instead of
    # being infinite — two scalar counts on model-sized frames.
    n_nodes = nodes.count()
    n_pairs = dist.count()
    if n_pairs != n_nodes * n_nodes:
        raise ValueError(
            f"graph_diameter: only {n_pairs} of {n_nodes}^2 node pairs "
            f"reachable within 2^{DIAM_ROUNDS} hops — graph disconnected "
            "or DIAM_ROUNDS too small; eccentricities would be silently "
            "per-component"
        )
    g = ecc.agg(
        F.max("eccentricity").alias("diameter"),
        F.min("eccentricity").alias("radius"),
    )
    return ecc.crossJoin(F.broadcast(g)).select(
        "node",
        "eccentricity",
        "diameter",
        "radius",
        F.when(F.col("eccentricity") == F.col("radius"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_center"),
        F.when(F.col("eccentricity") == F.col("diameter"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_periphery"),
        "reached",
    )


graph_diameter.__doc__ = graph_diameter.__doc__.format(r=DIAM_ROUNDS)
