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


@query("graph_small_world")  # composition vs analytic baseline → rows-only
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
    row = (
        int(n_nodes),
        int(n_edges),
        round(c_meas, 4),
        round(c_rand, 4),
        round(l_meas, 4),
        round(l_rand, 4),
        round(sigma, 4),
    )
    return spark.createDataFrame(
        [row],
        "nodes long, edges long, clustering double, clustering_rand "
        "double, path_len double, path_len_rand double, sigma double",
    )
