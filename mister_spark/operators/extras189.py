"""Wave 189: joint location-scale testing and LSH-graph kNN
classification eval.

stat_cucconi is the Cucconi joint location-scale rank test (1968,
public literature) — one statistic over squared ranks and squared
contrary ranks that fires when EITHER center or spread moves, the
single-test alternative to running Mood and Ansari-Bradley
separately. ml_knn_lsh_eval is the SCALE-PATH twin of
ml_knn_classify: where that op brute-forces a broadcast holdout,
this one scores EVERY vector leave-one-out through the sign-LSH
candidate graph (the ml_label_spreading edge machinery), the shape
that survives when neither side of the join fits in a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.extras129 import _ls_knn_cte, _ls_knn_edges
from mister_spark.registry import query

CUCCONI_GROUPS = ("click", "view")


@query(
    "stat_cucconi",
    # Real oracle: mid-ranks on the distinct-value frame are exact .5
    # doubles; both squared-rank sums and every moment are one pinned
    # expression shape (the final per-value summation order differs by
    # ~1e-14 relative — far inside the output grids).
    oracle=f"""
    WITH e AS (SELECT value,
                      CASE WHEN event_type = '{CUCCONI_GROUPS[0]}' THEN 1
                           ELSE 0 END AS g
               FROM events
               WHERE event_type IN ('{CUCCONI_GROUPS[0]}',
                                    '{CUCCONI_GROUPS[1]}')),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(g) AS DOUBLE) AS n1 FROM e),
    dv AS (SELECT value, CAST(COUNT(*) AS DOUBLE) AS w,
                  CAST(SUM(g) AS DOUBLE) AS w1
           FROM e GROUP BY 1),
    cum AS (SELECT value, w, w1, SUM(w) OVER (ORDER BY value) AS c
            FROM dv),
    sums AS (SELECT SUM(w1 * (((c - w) + (w + 1) / 2)
                              * ((c - w) + (w + 1) / 2))) AS s1,
                    SUM(w1 * ((nn.n + 1 - ((c - w) + (w + 1) / 2))
                              * (nn.n + 1 - ((c - w) + (w + 1) / 2))))
                      AS s2
             FROM cum, nn GROUP BY nn.n),
    f AS (SELECT nn.n1, nn.n - nn.n1 AS n2,
                 (6 * sums.s1 - nn.n1 * (nn.n + 1) * (2 * nn.n + 1))
                   / SQRT(nn.n1 * (nn.n - nn.n1) * (nn.n + 1)
                          * (2 * nn.n + 1) * (8 * nn.n + 11) / 5) AS u,
                 (6 * sums.s2 - nn.n1 * (nn.n + 1) * (2 * nn.n + 1))
                   / SQRT(nn.n1 * (nn.n - nn.n1) * (nn.n + 1)
                          * (2 * nn.n + 1) * (8 * nn.n + 11) / 5) AS v,
                 2 * (nn.n * nn.n - 4)
                   / ((2 * nn.n + 1) * (8 * nn.n + 11)) - 1 AS rho
          FROM nn, sums)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           FLOOR(u * 1e4 + 0.5) / 1e4 AS u,
           FLOOR(v * 1e4 + 0.5) / 1e4 AS v,
           FLOOR((u * u + v * v - 2 * rho * (u * v))
                 / (2 * (1 - rho * rho)) * 1e6 + 0.5) / 1e6 AS c
    FROM f
    """,
)
def stat_cucconi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi joint location-scale test (click vs view values): U
    standardizes group 1's sum of SQUARED mid-ranks, V the sum of
    squared CONTRARY ranks (N+1-R); C = (U² + V² - 2ρUV)/(2(1-ρ²))
    with the exact finite-sample correlation ρ — large C means the
    groups differ in center, spread, or both. One test instead of a
    Mood+Ansari pair, with exact moments, no normality assumption.

    Scale: mid-ranks come from the distinct-value frame's two-phase
    bucketed prefix sum (never a global sort); both squared-rank sums
    and all moments are ONE aggregate over |distinct values| rows."""
    e = (
        cat(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin(*CUCCONI_GROUPS))
        .select(
            "value",
            F.when(F.col("event_type") == CUCCONI_GROUPS[0], 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    nn = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("g").cast("double").alias("n1"),
    )
    dv = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("double").alias("w"),
        F.sum("g").cast("double").alias("w1"),
    )
    cum = bucketed_cumsum(dv, "value", {"c": F.col("w")})
    ncol = F.col("n")
    rbar = (F.col("c") - F.col("w")) + (F.col("w") + 1) / 2
    contra = ncol + 1 - rbar
    sums = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(
            F.sum(F.col("w1") * (rbar * rbar)).alias("s1"),
            F.sum(F.col("w1") * (contra * contra)).alias("s2"),
        )
    )
    n1 = F.col("n1")
    denom = F.sqrt(
        n1 * (ncol - n1) * (ncol + 1) * (2 * ncol + 1) * (8 * ncol + 11) / 5
    )
    u = (6 * F.col("s1") - n1 * (ncol + 1) * (2 * ncol + 1)) / denom
    v = (6 * F.col("s2") - n1 * (ncol + 1) * (2 * ncol + 1)) / denom
    rho = 2 * (ncol * ncol - 4) / ((2 * ncol + 1) * (8 * ncol + 11)) - 1
    f = sums.join(F.broadcast(nn), "n").select(
        n1.cast("bigint").alias("n1"),
        (ncol - n1).cast("bigint").alias("n2"),
        u.alias("u0"),
        v.alias("v0"),
        rho.alias("rho"),
    )
    return f.select(
        "n1",
        "n2",
        rnd(F.col("u0"), 4).alias("u"),
        rnd(F.col("v0"), 4).alias("v"),
        rnd(
            (
                F.col("u0") * F.col("u0")
                + F.col("v0") * F.col("v0")
                - 2 * F.col("rho") * (F.col("u0") * F.col("v0"))
            )
            / (2 * (1 - F.col("rho") * F.col("rho"))),
            6,
        ).alias("c"),
    )


@query(
    "ml_knn_lsh_eval",
    # Real oracle: reuses ml_label_spreading's sign-LSH kNN CTE chain
    # verbatim (integer signatures, grid-stable top-k); the majority
    # vote and accuracy are pure integer counting.
    oracle=f"""
    WITH {_ls_knn_cte("CAST(label AS INT)")},
    votes AS (SELECT k.a, e2.y, COUNT(*) AS cnt
              FROM knn k JOIN e e2 ON e2.vec_id = k.b
              GROUP BY 1, 2),
    pred AS (SELECT a, y AS yhat FROM (
        SELECT a, y, ROW_NUMBER() OVER (PARTITION BY a
                        ORDER BY cnt DESC, y) AS rk
        FROM votes) q
      WHERE rk = 1),
    m AS (SELECT
        (SELECT COUNT(*) FROM e) AS vectors,
        (SELECT COUNT(*) FROM pred) AS voted,
        (SELECT COUNT(*) FROM pred p JOIN e t ON t.vec_id = p.a
          WHERE t.y = p.yhat) AS correct)
    SELECT CAST(vectors AS BIGINT) AS vectors,
           CAST(voted AS BIGINT) AS voted,
           CAST(correct AS BIGINT) AS correct,
           FLOOR(CAST(correct AS DOUBLE) / NULLIF(voted, 0) * 1e4 + 0.5)
             / 1e4 AS accuracy
    FROM m
    """,
)
def ml_knn_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification eval over the labeled embeddings: each
    vector's label is predicted by majority vote of its 5 sign-LSH
    cosine neighbors (leave-one-out by construction — a node is never
    its own neighbor; vote ties break to the smallest label), scored
    against the true label. The 30-second answer to 'does this
    embedding space carry the label signal' before anyone trains a
    probe.

    Scale: the kNN edge frame is the SAME distributed LSH-bucket
    machinery as ml_label_spreading (_ls_knn_edges — no full-table
    collect anywhere); the vote is one groupBy + window over the ≤
    5n edge frame; nodes without LSH collisions are reported via
    vectors vs voted."""
    edges = _ls_knn_edges(spark, sf_dir)
    labels = (
        cat(spark, sf_dir)["embeddings"]
        .select("vec_id", F.col("label").cast("int").alias("y"))
        .localCheckpoint()
    )
    votes = (
        edges.join(labels, edges["b"] == labels["vec_id"])
        .groupBy("a", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wv = W.partitionBy("a").orderBy(F.desc("cnt"), "y")
    pred = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select(F.col("a").alias("vec_id"), F.col("y").alias("yhat"))
    )
    joined = labels.join(pred, "vec_id", "left")
    m = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("vectors"),
        F.sum(F.col("yhat").isNotNull().cast("int"))
        .cast("bigint")
        .alias("voted"),
        F.sum((F.col("yhat") == F.col("y")).cast("int"))
        .cast("bigint")
        .alias("correct"),
    )
    return m.select(
        "vectors",
        "voted",
        "correct",
        ratio(
            F.col("correct").cast("double")
            / F.nullif(F.col("voted"), F.lit(0)).cast("double")
        ).alias("accuracy"),
    )
