"""Wave 188: harmonic centrality and isotonic regression.

graph_harmonic_centrality ranks nodes by the sum of inverse shortest
distances from sampled sources — the closeness variant that handles
disconnected graphs gracefully (1/inf = 0 instead of collapsing).
ml_isotonic_regression fits the best MONOTONE price-vs-quantity curve
by weighted least squares via the minimax (greatest-convex-minorant)
form of pool-adjacent-violators, computed entirely on the quantity
value grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.extras9 import _EDGE_SQL, _undirected_edges
from mister_spark.registry import query

HC_SOURCES = 32  # lowest-id BFS sources (sampled at larger graphs)
HC_MAX_HOPS = 6


@query(
    "graph_harmonic_centrality",
    # Real oracle: multi-source BFS min-hop distances are a recursive
    # CTE keyed by (src, node); harmonic sums divide exact integers
    # (1e-4 grid absorbs the per-source summation order).
    oracle=f"""
    WITH RECURSIVE e0 AS ({_EDGE_SQL}),
    und AS (SELECT DISTINCT a, b FROM (
              SELECT src AS a, dst AS b FROM e0
              UNION ALL SELECT dst, src FROM e0)),
    nodes AS (SELECT DISTINCT a AS node FROM und),
    srcs AS (SELECT node AS src FROM nodes ORDER BY node
             LIMIT {HC_SOURCES}),
    bfs AS (
      SELECT src, src AS node, 0 AS hops FROM srcs
      UNION
      SELECT bfs.src, u.b, bfs.hops + 1
      FROM bfs JOIN und u ON u.a = bfs.node
      WHERE bfs.hops < {HC_MAX_HOPS}
    ),
    dist AS (SELECT src, node, MIN(hops) AS d FROM bfs
             GROUP BY 1, 2),
    h AS (SELECT n.node,
                 CAST(COUNT(*) FILTER (WHERE dist.d > 0) AS BIGINT)
                   AS reached,
                 SUM(CASE WHEN dist.d > 0 THEN 1.0 / dist.d
                          ELSE 0.0 END) AS hsum
          FROM nodes n LEFT JOIN dist ON dist.node = n.node
          GROUP BY 1)
    SELECT CAST(node AS BIGINT) AS node, reached,
           FLOOR(hsum * 1e4 + 0.5) / 1e4 AS harmonic
    FROM h
    ORDER BY hsum DESC, node
    """,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality from the {s} lowest-id sources: H(v) =
    sum over sources u of 1/d(u, v) (unreachable contributes 0, so
    disconnected components never produce the infinities that break
    classic closeness). The 'how quickly can the network reach v'
    rank — sampled sources make it an unbiased estimator at graphs
    where all-pairs BFS is off the table.

    Scale: ONE simultaneous multi-source BFS — state is a (src, node,
    hops) frame keyed by node for the frontier-adjacency join, so
    {s} sources cost one traversal of extra rows, not {s} traversals;
    per round = join + anti-join with localCheckpoint lineage cuts
    (the graph_betweenness_sampled discipline). Source count is the
    accuracy/cost knob at 100 TB."""
    und = _undirected_edges(spark, sf_dir)
    nodes = und.select(F.col("a").alias("node")).distinct().localCheckpoint()
    srcs = nodes.orderBy("node").limit(HC_SOURCES)
    visited = srcs.select(
        F.col("node").alias("src"), F.col("node"), F.lit(0).alias("hops")
    ).localCheckpoint()
    frontier = visited
    for hop in range(1, HC_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select("src", F.col("b").alias("node"))
            .distinct()
            .join(visited.select("src", "node"), ["src", "node"], "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    h = (
        nodes.join(visited, "node", "left")
        .groupBy("node")
        .agg(
            F.sum(F.when(F.col("hops") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("reached"),
            F.sum(
                F.when(F.col("hops") > 0, 1.0 / F.col("hops")).otherwise(0.0)
            ).alias("hsum"),
        )
    )
    return (
        h.orderBy(F.desc("hsum"), "node")
        .select(
            F.col("node").cast("bigint").alias("node"),
            "reached",
            ratio(F.col("hsum")).alias("harmonic"),
        )
    )


@query(
    "ml_isotonic_regression",
    # Real oracle: the minimax PAV form on the quantity grid — every
    # interval average is one division of cross-engine sums (ulp-order
    # differences live far inside the 1e-2 money grid), and min/max
    # pick VALUES, not indices, so near-tie flips cannot move the
    # output off-grid.
    oracle="""
    WITH g AS (SELECT l_quantity AS x, CAST(COUNT(*) AS DOUBLE) AS w,
                      SUM(l_extendedprice) AS sy
               FROM lineitem GROUP BY 1),
    p AS (SELECT a.x, SUM(b.w) AS cw, SUM(b.sy) AS cy
          FROM g a JOIN g b ON b.x <= a.x GROUP BY a.x),
    iv AS (SELECT lo.x AS j, hi.x AS k,
                  (hi.cy - COALESCE(lj.cy, 0))
                    / (hi.cw - COALESCE(lj.cw, 0)) AS avg
           FROM p lo JOIN p hi ON lo.x <= hi.x
           LEFT JOIN p lj ON lj.x = (SELECT MAX(x) FROM p WHERE x < lo.x)),
    mn AS (SELECT iv.j, gi.x AS i, MIN(iv.avg) AS m
           FROM iv JOIN g gi ON iv.j <= gi.x AND gi.x <= iv.k
           GROUP BY 1, 2),
    fit AS (SELECT i AS x, MAX(m) AS f FROM mn WHERE j <= i GROUP BY 1)
    SELECT CAST(g.x AS DOUBLE) AS x, CAST(g.w AS BIGINT) AS n,
           FLOOR(g.sy / g.w * 100 + 0.5) / 100 AS mean_y,
           FLOOR(fit.f * 100 + 0.5) / 100 AS iso_fit
    FROM g JOIN fit ON fit.x = g.x
    ORDER BY g.x
    """,
)
def ml_isotonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic regression of extendedprice on quantity: the
    best monotone-nondecreasing step function under squared loss,
    via the minimax characterization of pool-adjacent-violators —
    fit(i) = max over j<=i of min over k>=i of the weighted mean of
    y over grid interval [j, k]. The calibration-curve fit: raw bin
    means wobble, the isotonic fit is the provably-optimal monotone
    smoothing of them.

    Scale: ONE groupBy collapses the fact table to the |distinct
    quantity| grid (50 points at any corpus size); prefix sums,
    all O(grid^2) interval averages, and the minimax reduce live on
    broadcast-joined model-sized frames — never row-level data."""
    g = (
        cat(spark, sf_dir)["lineitem"]
        .groupBy(F.col("l_quantity").alias("x"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("w"),
            F.sum("l_extendedprice").alias("sy"),
        )
        .localCheckpoint()
    )
    p = (
        g.alias("a")
        .join(F.broadcast(g.alias("b")), F.col("b.x") <= F.col("a.x"))
        .groupBy(F.col("a.x").alias("x"))
        .agg(F.sum("b.w").alias("cw"), F.sum("b.sy").alias("cy"))
        .localCheckpoint()
    )
    # prefix row strictly below each x (for interval [j, k] sums)
    prev = (
        p.alias("a")
        .join(F.broadcast(p.alias("b")), F.col("b.x") < F.col("a.x"), "left")
        .groupBy(F.col("a.x").alias("x"), F.col("a.cw").alias("cw"), F.col("a.cy").alias("cy"))
        .agg(F.max("b.x").alias("px"))
    )
    lj = p.select(
        F.col("x").alias("px"), F.col("cw").alias("pcw"), F.col("cy").alias("pcy")
    )
    iv = (
        prev.join(F.broadcast(lj), "px", "left")
        .select(
            F.col("x").alias("j"),
            F.coalesce("pcw", F.lit(0.0)).alias("jcw"),
            F.coalesce("pcy", F.lit(0.0)).alias("jcy"),
        )
        .join(
            F.broadcast(p.select(F.col("x").alias("k"), "cw", "cy")),
            F.col("j") <= F.col("k"),
        )
        .select(
            "j",
            "k",
            (
                (F.col("cy") - F.col("jcy")) / (F.col("cw") - F.col("jcw"))
            ).alias("avg"),
        )
    )
    gi = g.select(F.col("x").alias("i"))
    mn = (
        iv.join(
            F.broadcast(gi),
            (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")),
        )
        .groupBy("j", "i")
        .agg(F.min("avg").alias("m"))
    )
    fit = (
        mn.filter(F.col("j") <= F.col("i"))
        .groupBy(F.col("i").alias("x"))
        .agg(F.max("m").alias("f"))
    )
    return (
        g.join(F.broadcast(fit), "x")
        .orderBy("x")
        .select(
            F.col("x").cast("double").alias("x"),
            F.col("w").cast("bigint").alias("n"),
            money(F.col("sy") / F.col("w")).alias("mean_y"),
            money(F.col("f")).alias("iso_fit"),
        )
    )


graph_harmonic_centrality.__doc__ = graph_harmonic_centrality.__doc__.format(
    s=HC_SOURCES
)
