"""Wave 142: Markov predictor evaluation and small-world testing.

ev_markov_eval closes the loop on ev_markov: the fitted transition
matrix becomes a next-event predictor (argmax row) and is scored
against the actual next events, with the majority-class baseline
that any predictor must beat to justify its state; graph_small_world
computes the small-world coefficient — measured clustering and path
length against their random-graph expectations — the 'is this a
real network or a hairball' classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras114 import CLOSE_ROUNDS, CLOSE_SEEDS
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query


@query(
    "ev_markov_eval",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                        AS next_type
               FROM events),
    pairs AS (SELECT event_type AS ft, next_type AS tt FROM s
              WHERE next_type IS NOT NULL),
    trans AS (SELECT ft, tt, CAST(COUNT(*) AS BIGINT) AS n
              FROM pairs GROUP BY 1, 2),
    pred AS (SELECT ft, tt AS predicted FROM (
               SELECT ft, tt,
                      ROW_NUMBER() OVER (PARTITION BY ft
                                         ORDER BY n DESC, tt) AS rk
               FROM trans) WHERE rk = 1),
    maj AS (SELECT tt AS majority FROM (
              SELECT tt, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tt)
                       AS rk
              FROM pairs GROUP BY tt) WHERE rk = 1),
    acc AS (SELECT
              AVG(CASE WHEN p.tt = pr.predicted THEN 1.0 ELSE 0 END)
                AS markov_acc,
              AVG(CASE WHEN p.tt = maj.majority THEN 1.0 ELSE 0 END)
                AS baseline_acc,
              CAST(COUNT(*) AS BIGINT) AS pairs
            FROM pairs p JOIN pred pr ON p.ft = pr.ft, maj)
    SELECT pairs,
           FLOOR(markov_acc * 10000 + 0.5) / 10000 AS markov_accuracy,
           FLOOR(baseline_acc * 10000 + 0.5) / 10000 AS baseline_accuracy,
           FLOOR((markov_acc - baseline_acc) * 10000 + 0.5) / 10000
             AS lift
    FROM acc
    """,
)
def ev_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event predictor evaluation: predict each next
    event as the argmax of its current type's transition row
    (ev_markov's matrix), scored on the SAME stream against the
    majority-class baseline — the delta is what first-order state
    actually buys. Near-zero lift on memoryless synthetic journeys
    is the honest read (and the asserted one); real journeys show
    their memory here.

    Scale: the lead pairs reuse the sessionize exchange; the
    transition matrix and its argmax are |types|²-sized; scoring is
    one broadcast join over the pair stream."""
    ev = cat(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull()).localCheckpoint()
    trans = s.groupBy(
        F.col("event_type").alias("ft"), F.col("next_type").alias("tt")
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = W.partitionBy("ft").orderBy(F.col("n").desc(), "tt")
    pred = (
        trans.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("ft", F.col("tt").alias("predicted"))
    )
    maj_row = (
        s.groupBy("next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "next_type")
        .limit(1)
        .collect()[0]
    )
    majority = maj_row["next_type"]
    acc = (
        s.join(F.broadcast(pred), s.event_type == pred.ft)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pairs"),
            F.avg(
                (F.col("next_type") == F.col("predicted")).cast("double")
            ).alias("markov_acc"),
            F.avg(
                (F.col("next_type") == F.lit(majority)).cast("double")
            ).alias("baseline_acc"),
        )
    )
    return acc.select(
        "pairs",
        ratio(F.col("markov_acc")).alias("markov_accuracy"),
        ratio(F.col("baseline_acc")).alias("baseline_accuracy"),
        ratio(F.col("markov_acc") - F.col("baseline_acc")).alias("lift"),
    )


@query(
    "graph_small_world",
    # Real oracle: triangles/wedges are plain joins and integer
    # aggregates; the landmark path length reuses the
    # graph_closeness_sampled CTE (same dedup-UNION BFS) and — like
    # the Spark side, which reads the op's ROUNDED output rows —
    # inverts the floor-rounded closeness values; the ER baselines
    # and sigma are scalar arithmetic on the same doubles.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    seeds AS (SELECT p1 AS seed FROM (
                SELECT DISTINCT p1 FROM csym ORDER BY p1
                LIMIT {CLOSE_SEEDS}) s),
    bfs AS (
      SELECT seed, seed AS node, 0 AS d FROM seeds
      UNION
      SELECT b.seed, e.p2 AS node, b.d + 1
      FROM bfs b JOIN csym e ON b.node = e.p1
      WHERE b.d < {CLOSE_ROUNDS}
    ),
    dist AS (SELECT seed, node, MIN(d) AS d FROM bfs GROUP BY 1, 2),
    clos AS (SELECT seed,
                    FLOOR((COUNT(*) - 1)
                          / GREATEST(CAST(SUM(d) AS DOUBLE), 1.0)
                          * 10000 + 0.5) / 10000 AS closeness
             FROM dist GROUP BY seed),
    lmean AS (SELECT AVG(1.0 / closeness) AS l_meas
              FROM clos WHERE closeness > 0),
    base AS (SELECT CAST(COUNT(DISTINCT p1) AS BIGINT) AS n_nodes,
                    (SELECT CAST(COUNT(*) AS BIGINT) FROM ce) AS n_edges
             FROM csym),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM ce ab JOIN ce bc ON ab.p2 = bc.p1
                       JOIN ce ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2),
    wg AS (SELECT SUM(d * (d - 1) / 2) AS w FROM (
             SELECT CAST(COUNT(*) AS DOUBLE) AS d
             FROM csym GROUP BY p1) q),
    m AS (SELECT b.n_nodes, b.n_edges,
                 2.0 * b.n_edges / b.n_nodes AS kbar,
                 CASE WHEN wg.w > 0 THEN 3.0 * tri.t / wg.w
                      ELSE 0.0 END AS c_meas,
                 (2.0 * b.n_edges / b.n_nodes) / b.n_nodes AS c_rand,
                 lm.l_meas,
                 LN(b.n_nodes)
                   / LN(GREATEST(2.0 * b.n_edges / b.n_nodes, 1.001))
                   AS l_rand
          FROM base b, tri, wg, lmean lm)
    SELECT n_nodes AS nodes, n_edges AS edges,
           FLOOR(c_meas * 10000 + 0.5) / 10000 AS clustering,
           FLOOR(c_rand * 10000 + 0.5) / 10000 AS clustering_rand,
           FLOOR(l_meas * 10000 + 0.5) / 10000 AS path_len,
           FLOOR(l_rand * 10000 + 0.5) / 10000 AS path_len_rand,
           FLOOR(CASE WHEN c_rand > 0
                      THEN (c_meas / c_rand) / (l_meas / l_rand)
                      ELSE 0.0 END * 10000 + 0.5) / 10000 AS sigma
    FROM m
    """,
)
def graph_small_world(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-world test for the co-purchase graph: measured global
    clustering C (closed triangles over wedges) and mean landmark
    path length L against the Erdős–Rényi expectations
    C_rand = k̄/n and L_rand = ln n / ln k̄; the small-world
    coefficient σ = (C/C_rand)/(L/L_rand) ≫ 1 means real structure
    (clustered yet short) — σ ≈ 1 means the graph is
    indistinguishable from random wiring.

    Scale: triangles/wedges from the oriented wedge join (capped);
    path lengths from the multi-source BFS frame; baselines are
    scalar arithmetic."""
    import math

    from mister_spark.operators.extras47 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()
    n_nodes = sym.select("u").distinct().count()
    n_edges = e.count()
    kbar = 2.0 * n_edges / n_nodes
    # triangles (oriented) and wedges
    ab = e.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    bc = e.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    ac = e.select(F.col("p1").alias("a"), F.col("p2").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).count()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    c_meas = 3.0 * tri / wedges if wedges else 0.0
    c_rand = kbar / n_nodes
    # mean path length from the sampled-closeness landmarks
    from mister_spark.operators.extras114 import graph_closeness_sampled

    cl = graph_closeness_sampled(spark, sf_dir).collect()
    # closeness = (reached-1)/dist_sum → mean dist = 1/closeness
    ls = [1.0 / r["closeness"] for r in cl if r["closeness"] > 0]
    l_meas = sum(ls) / len(ls)
    l_rand = math.log(n_nodes) / math.log(max(kbar, 1.001))
    sigma = (c_meas / c_rand) / (l_meas / l_rand) if c_rand > 0 else 0.0
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (
        int(n_nodes),
        int(n_edges),
        r4(c_meas),
        r4(c_rand),
        r4(l_meas),
        r4(l_rand),
        r4(sigma),
    )
    return spark.createDataFrame(
        [row],
        "nodes long, edges long, clustering double, clustering_rand "
        "double, path_len double, path_len_rand double, sigma double",
    )
