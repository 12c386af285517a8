"""Wave 170: Allen interval algebra and sampled betweenness centrality.

j_allen_relations classifies every overlapping (session, error-window)
interval pair into its Allen-algebra relation — the temporal-reasoning
vocabulary (equals/starts/finishes/during/contains/overlaps/meets and
mirrors) behind conflict detection and timeline QA — using the same
grid equi-join candidate generation as j_interval_overlap, never an
inequality nested loop. graph_betweenness_sampled runs Brandes'
algorithm from a deterministic source sample over the co-purchase
graph, all sources advanced simultaneously as one (src, node)-keyed
frontier, forward BFS + backward dependency accumulation as joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.events import GAP_US, _ev
from mister_spark.operators.extras12 import _SESS_AGG_SQL, ERR_PAD_US
from mister_spark.operators.extras47 import _copurchase_edges
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query

BW_SOURCES = 8  # Brandes source sample size (smallest part keys)

# Mutually exclusive, exhaustive CASE over contact pairs (s<=we, ws<=e),
# evaluated in IDENTICAL order on both engines. Intervals are closed
# integer microseconds: session [s, e], error window [ws, we].
_ALLEN_CASE = """
    CASE WHEN s = ws AND e = we THEN 'equals'
         WHEN e = ws THEN 'meets'
         WHEN s = we THEN 'met_by'
         WHEN s = ws AND e < we THEN 'starts'
         WHEN s = ws AND e > we THEN 'started_by'
         WHEN e = we AND s > ws THEN 'finishes'
         WHEN e = we AND s < ws THEN 'finished_by'
         WHEN s > ws AND e < we THEN 'during'
         WHEN s < ws AND e > we THEN 'contains'
         WHEN s < ws THEN 'overlaps'
         ELSE 'overlapped_by' END
"""


@query(
    "j_allen_relations",
    oracle=f"""
    WITH sess AS ({_SESS_AGG_SQL}),
    err AS (
      SELECT user_id, epoch_us(ts) - {ERR_PAD_US} AS ws,
             epoch_us(ts) + {ERR_PAD_US} AS we
      FROM events WHERE event_type = 'error'),
    pairs AS (
      SELECT DISTINCT s.user_id, s.sess_id, s.s, s.e, e.ws, e.we
      FROM sess s JOIN err e
        ON s.user_id = e.user_id AND s.s <= e.we AND e.ws <= s.e)
    SELECT {_ALLEN_CASE} AS relation, CAST(COUNT(*) AS BIGINT) AS pairs
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
)
def j_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen-relation census of session x (error ± 2 min) interval
    pairs per user: every contact pair (the 11 non-disjoint Allen
    relations; before/after are the non-candidates) classified by one
    mutually-exclusive CASE evaluated in the same order on both
    engines, then counted per relation. The answer to 'HOW do error
    windows touch sessions — engulf them, clip their start, or just
    graze the boundary?'.

    Scale: candidates come from the same 1-hour-grid explode +
    (user, cell) equi-join as j_interval_overlap (fan-out bounded by
    interval length / cell width, no inequality nested loop); the
    multi-cell duplicates collapse on the slim (user, sess, window)
    pair frame before classification; the census is one rollup over
    <= 11 relation rows."""
    ev = _ev(spark, sf_dir).select("user_id", "tus", "event_type")
    w = W.partitionBy("user_id").orderBy("tus")
    lagged = F.lag("tus").over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(
                lagged.isNull() | (F.col("tus") - lagged > GAP_US), 1
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("tus").alias("s"), F.max("tus").alias("e"))
    )
    s_cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(F.expr("s div 3600000000"), F.expr("e div 3600000000"))
        ),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        (F.col("tus") - ERR_PAD_US).alias("ws"),
        (F.col("tus") + ERR_PAD_US).alias("we"),
    )
    e_cells = err.withColumn(
        "cell",
        F.explode(
            F.sequence(F.expr("ws div 3600000000"), F.expr("we div 3600000000"))
        ),
    )
    pairs = (
        s_cells.join(e_cells, ["user_id", "cell"])
        .filter((F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e")))
        .select("user_id", "sess_id", "s", "e", "ws", "we")
        .distinct()
    )
    return (
        pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pairs"))
        .orderBy("relation")
    )


@query(
    "graph_betweenness_sampled",
    # Real oracle: Brandes in three recursions — (1) dedup-UNION BFS
    # for distances (capped at 64 hops, far above any real
    # eccentricity here, because walk tuples would otherwise extend
    # forever), (2) a level-synchronous sigma recursion (path counts
    # are integer-valued doubles — exact), (3) the backward delta pass
    # descending one level per iteration, contributions joined from
    # the previous level's working rows. The top-10 cut orders by the
    # ROUNDED betweenness with a node tie-break, so the boundary is
    # grid-stable on both engines.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    src AS (SELECT p1 AS s FROM (
              SELECT DISTINCT p1 FROM csym ORDER BY p1
              LIMIT {BW_SOURCES}) q),
    bfs AS (
      SELECT s AS src, s AS node, 0 AS d FROM src
      UNION
      SELECT b.src, e.p2, b.d + 1
      FROM bfs b JOIN csym e ON e.p1 = b.node
      WHERE b.d < 64),
    dist AS MATERIALIZED (SELECT src, node, MIN(d) AS dist
                          FROM bfs GROUP BY 1, 2),
    sig AS (
      SELECT s AS src, s AS node, 0 AS d, CAST(1.0 AS DOUBLE) AS sigma
      FROM src
      UNION ALL
      SELECT s.src, e.p2 AS node, s.d + 1, SUM(s.sigma)
      FROM sig s JOIN csym e ON e.p1 = s.node
      JOIN dist dw ON dw.src = s.src AND dw.node = e.p2
                  AND dw.dist = s.d + 1
      GROUP BY 1, 2, 3),
    sg AS MATERIALIZED (SELECT src, node, d AS dist, sigma FROM sig),
    dmax AS (SELECT MAX(dist) AS d FROM sg),
    back AS (
      SELECT g.src, g.node, g.dist, g.sigma,
             CAST(0.0 AS DOUBLE) AS delta, m.d AS lev
      FROM sg g, dmax m WHERE g.dist = m.d
      UNION ALL
      SELECT g.src, g.node, g.dist, g.sigma,
             COALESCE(c.inc, 0.0), l.lv
      FROM (SELECT MAX(lev) - 1 AS lv FROM back) l
      JOIN sg g ON g.dist = l.lv
      LEFT JOIN (
        SELECT b.src, gv.node AS vnode,
               SUM(gv.sigma / b.sigma * (1 + b.delta)) AS inc
        FROM back b JOIN csym e ON e.p2 = b.node
        JOIN sg gv ON gv.src = b.src AND gv.node = e.p1
                  AND gv.dist = b.dist - 1
        GROUP BY 1, 2) c
        ON c.src = g.src AND c.vnode = g.node
      WHERE l.lv >= 0),
    bc AS (SELECT node,
                  FLOOR(SUM(delta) / 2.0 * 10000 + 0.5) / 10000
                    AS betweenness
           FROM back WHERE node <> src GROUP BY node)
    SELECT node, betweenness FROM bc
    ORDER BY betweenness DESC, node LIMIT 10
    """,
)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes betweenness centrality sampled from the {k} smallest
    part keys of the co-purchase graph (deterministic source set):
    forward BFS computes distance and shortest-path counts sigma for
    ALL sources simultaneously on one (src, node)-keyed frontier;
    the backward pass walks depth levels descending, accumulating
    delta(v) += sigma(v)/sigma(w) * (1 + delta(w)) over predecessor
    edges. Emits the top-10 nodes by sampled betweenness — the
    brokers whose removal disconnects shopping missions.

    Scale: rounds are bounded by the sampled eccentricity (small-world
    graphs: ~6); every round is an edge join + min/sum aggregate on
    (src, node) rows — K x |V| state, never collected; localCheckpoint
    cuts per-round lineage. State is kept as ONE CHECKPOINTED FRAME PER
    BFS LEVEL (round-11): the forward anti-join reads the lazy union of
    the level checkpoints instead of re-materializing a growing visited
    frame every round, and the backward pass writes each level's delta
    exactly once (a row's delta is only ever set when its own level is
    processed) instead of left-joining the per-level contributions into
    — and re-checkpointing — the whole K x |V| frame once per level
    (guide §1.2: same math, ~2x less materialized state per round).
    Estimates scale up by |V|/K as usual for source-sampled Brandes
    (Bader et al., public literature)."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = (
        e.select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .unionByName(e.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
        .localCheckpoint()
    )
    sources = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(BW_SOURCES)
        .withColumn("src", F.col("node"))
    )
    # forward BFS: one checkpointed (src, node, sigma) frame per level
    levels = [
        sources.select(
            "src", "node", F.lit(1.0).alias("sigma")
        ).localCheckpoint()
    ]
    while True:
        frontier = levels[-1]
        expanded = (
            frontier.select(
                F.col("src").alias("f_src"),
                F.col("node").alias("f_node"),
                F.col("sigma").alias("f_sigma"),
            )
            .join(sym, F.col("f_node") == sym["u"])
            .select("f_src", F.col("v").alias("f_dst"), "f_sigma")
        )
        seen = None  # lazy union of the level checkpoints
        for lv in levels:
            s = lv.select(
                F.col("src").alias("s_src"), F.col("node").alias("s_node")
            )
            seen = s if seen is None else seen.unionByName(s)
        nxt = (
            expanded.join(
                seen,
                (F.col("f_src") == F.col("s_src"))
                & (F.col("f_dst") == F.col("s_node")),
                "left_anti",
            )
            .groupBy(
                F.col("f_src").alias("src"), F.col("f_dst").alias("node")
            )
            .agg(F.sum("f_sigma").alias("sigma"))
            .select("src", "node", "sigma")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
    max_depth = len(levels) - 1
    # backward accumulation by descending depth: deltas[d] is level d's
    # rows with their final delta (set exactly once, at step d+1 — in
    # the old full-frame shape only dist == d-1 rows ever changed at
    # each step, so the per-level frames reproduce it bit-for-bit)
    deltas = [None] * (max_depth + 1)
    deltas[max_depth] = levels[max_depth].withColumn("delta", F.lit(0.0))
    for d in range(max_depth, 0, -1):
        lower = deltas[d].select(
            F.col("src").alias("w_src"),
            F.col("node").alias("w_node"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        upper = levels[d - 1].select(
            F.col("src").alias("v_src"),
            F.col("node").alias("v_node"),
            F.col("sigma").alias("v_sigma"),
        )
        contrib = (
            upper.join(sym, F.col("v_node") == sym["u"])
            .join(
                lower,
                (F.col("v_src") == F.col("w_src"))
                & (sym["v"] == F.col("w_node")),
            )
            .groupBy(
                F.col("v_src").alias("src"), F.col("v_node").alias("node")
            )
            .agg(
                F.sum(
                    F.col("v_sigma")
                    / F.col("w_sigma")
                    * (F.lit(1.0) + F.col("w_delta"))
                ).alias("inc")
            )
        )
        deltas[d - 1] = (
            levels[d - 1]
            .join(contrib, ["src", "node"], "left")
            .select(
                "src",
                "node",
                "sigma",
                F.coalesce("inc", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )
    alld = deltas[0]
    for fr in deltas[1:]:
        alld = alld.unionByName(fr)
    bc = (
        alld.filter(F.col("node") != F.col("src"))
        .groupBy("node")
        .agg(F.sum("delta").alias("betweenness"))
    )
    return (
        bc.select(
            "node", ratio(F.col("betweenness") / 2.0).alias("betweenness")
        )
        .orderBy(F.col("betweenness").desc(), "node")
        .limit(10)
    )


graph_betweenness_sampled.__doc__ = graph_betweenness_sampled.__doc__.format(
    k=BW_SOURCES
)
