"""Wave 152: assortativity curves and Neyman budget allocation.

graph_neighbor_degree_curve plots mean neighbor degree against node
degree — the full assortativity CURVE behind the single coefficient
(rising: hubs prefer hubs; falling: hub-and-spoke disassortativity,
the usual shape of purchase graphs); ds_neyman_allocation splits a
fixed labeling budget across sources by N_h·σ_h (Neyman-optimal)
next to the proportional split — variance-aware annotation
budgeting, the sampling-design classic that saves real label money.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import COP_SUPPORT, _DUCK_BASKETS, _copurchase_edges
from mister_spark.registry import query

LABEL_BUDGET = 100


@query(
    "graph_neighbor_degree_curve",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    sym AS (SELECT p1 AS u, p2 AS v FROM e
            UNION ALL SELECT p2, p1 FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY 1),
    knn AS (SELECT s.u, AVG(dv.d) AS knn_u
            FROM sym s JOIN deg dv ON s.v = dv.u
            GROUP BY 1)
    SELECT CAST(du.d AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS nodes,
           FLOOR(AVG(knn.knn_u) * 10000 + 0.5) / 10000
             AS mean_neighbor_degree
    FROM knn JOIN deg du ON knn.u = du.u
    GROUP BY du.d
    """,
)
def graph_neighbor_degree_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortativity curve k_nn(k): for each node degree, the mean
    degree of those nodes' neighbors. A falling curve (high-degree
    hubs connected to low-degree leaves) is disassortative
    hub-and-spoke structure; rising means rich-club mixing — the
    CURVE behind graph_assortativity's single coefficient, and the
    first thing to plot before believing it.

    Scale: degrees are one rollup broadcast into the edge list; the
    curve is a |distinct degrees|-row aggregate."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    knn = (
        sym.join(
            F.broadcast(deg.select(F.col("u").alias("v"),
                                   F.col("d").alias("dv"))), "v"
        )
        .groupBy("u")
        .agg(F.avg("dv").alias("knn_u"))
    )
    return (
        knn.join(F.broadcast(deg), "u")
        .groupBy(F.col("d").cast("bigint").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nodes"),
            ratio(F.avg("knn_u")).alias("mean_neighbor_degree"),
        )
    )


@query(
    "ds_neyman_allocation",
    oracle=f"""
    WITH t AS (SELECT source,
                      CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                        / NULLIF(len({DUCK_TOKENS}), 0) AS q
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    g AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
                 COALESCE(STDDEV_SAMP(q), 0) AS sd
          FROM t GROUP BY 1),
    tot AS (SELECT SUM(n) AS nn, SUM(n * sd) AS nsd FROM g)
    SELECT g.source,
           CAST(g.n AS BIGINT) AS docs,
           FLOOR(g.sd * 10000 + 0.5) / 10000 AS quality_sd,
           CAST(FLOOR({LABEL_BUDGET} * g.n / tot.nn + 0.5) AS BIGINT)
             AS proportional_labels,
           CAST(FLOOR({LABEL_BUDGET} * g.n * g.sd
                      / NULLIF(tot.nsd, 0) + 0.5) AS BIGINT)
             AS neyman_labels
    FROM g, tot
    """,
)
def ds_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal labeling-budget allocation: split {b} human
    labels across sources by N_h·σ_h (population × quality-score
    spread) beside the naive proportional split. Sources whose
    quality varies get MORE labels than their size alone warrants —
    that reallocation is exactly what minimizes the stratified
    estimator's variance, and it's free to compute before anyone
    labels anything.

    Scale: per-source quality moments in one shuffle; the allocation
    is |sources|-row arithmetic with broadcast totals."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select(
            "source",
            (
                F.size(F.array_distinct(toks)).cast("double")
                / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
            ).alias("q"),
        )
        .filter(F.col("q").isNotNull())
    )
    g = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.coalesce(F.stddev_samp("q"), F.lit(0.0)).alias("sd"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n") * F.col("sd")).alias("nsd"),
    )
    j = g.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        F.col("n").cast("bigint").alias("docs"),
        ratio(F.col("sd")).alias("quality_sd"),
        F.floor(LABEL_BUDGET * F.col("n") / F.col("nn") + 0.5)
        .cast("bigint")
        .alias("proportional_labels"),
        F.floor(
            LABEL_BUDGET
            * F.col("n")
            * F.col("sd")
            / F.nullif(F.col("nsd"), F.lit(0.0))
            + 0.5
        )
        .cast("bigint")
        .alias("neyman_labels"),
    )


ds_neyman_allocation.__doc__ = ds_neyman_allocation.__doc__.format(
    b=LABEL_BUDGET
)
