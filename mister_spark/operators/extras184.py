"""Wave 184: SQL pipe syntax and histogram-based outlier scores.

sql_pipe_syntax pins Spark 4's SQL pipe operators (`|>`): the same
pricing rollup written as a linear FROM -> WHERE -> AGGREGATE ->
ORDER BY pipeline, verified against the plain-ANSI form in DuckDB —
queries read top-to-bottom in execution order, and the engines must
agree to the cent. ml_hbos_outliers is the Histogram-Based Outlier
Score (Goldstein & Dengel, public literature): per-dimension density
histograms scored independently and summed in log space — the
O(n) unsupervised outlier detector that needs no pairwise distances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

HBOS_DIMS = 4
HBOS_BINS = 10
HBOS_TOP = 10


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
             / 100 AS disc_revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-01'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax, verified: the pricing rollup written
    as `FROM |> WHERE |> AGGREGATE ... GROUP BY |> ORDER BY` — each
    stage feeds the next in reading order, the form that makes long
    SQL reviewable — must match the classic ANSI statement DuckDB
    runs, to the cent. The pipe form is purely syntactic: Catalyst
    plans the identical scan -> partial-agg -> exchange -> final-agg.

    Scale: one partial-agg shuffle on the two grouping flags; the
    shipdate predicate reaches the parquet scan through the pipe
    WHERE exactly as it does through the classic one."""
    cat(spark, sf_dir)["lineitem"].createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-01'
        |> AGGREGATE CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                     FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100
                           + 0.5) / 100 AS disc_revenue,
                     CAST(COUNT(*) AS BIGINT) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, disc_revenue, n
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "ml_hbos_outliers",
    oracle=f"""
    WITH m AS (SELECT vec_id, d.d AS dim,
                      CAST(embedding[d.d] AS DOUBLE) AS x
               FROM embeddings,
                    (SELECT UNNEST(generate_series(1, {HBOS_DIMS})) AS d)
                      d),
    mm AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM m GROUP BY 1),
    b AS (SELECT m.vec_id, m.dim,
                 LEAST(CAST(FLOOR((m.x - mm.mn)
                                  / ((mm.mx - mm.mn) / {HBOS_BINS}.0))
                            AS BIGINT), {HBOS_BINS} - 1) AS bin
          FROM m JOIN mm ON m.dim = mm.dim),
    dens AS (SELECT dim, bin, CAST(COUNT(*) AS DOUBLE) AS c FROM b
             GROUP BY 1, 2),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
    sc AS (SELECT b.vec_id,
                  SUM(-LN(dens.c / n.n)) AS score
           FROM b JOIN dens ON b.dim = dens.dim AND b.bin = dens.bin, n
           GROUP BY 1)
    SELECT vec_id, FLOOR(score * 10000 + 0.5) / 10000 AS hbos
    FROM sc ORDER BY score DESC, vec_id LIMIT {HBOS_TOP}
    """,
)
def ml_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score over the first {d} embedding
    dimensions: {b} equal-width bins per dimension, per-bin density,
    score = sum over dimensions of -ln(density of the row's bin) —
    rows living in thin bins across many dimensions float to the top.
    Top-{t} reported. HBOS treats dimensions independently, which is
    exactly why it is O(n): no pairwise distances, no covariance — the
    cheap first-pass screen before Mahalanobis-class detectors.

    Scale: the (dim, value) explode is map-side; per-dim min/max and
    the {d}x{b} density table are one rollup each and broadcast back;
    the per-row score is one partial-agg shuffle; top-K plans
    TakeOrdered."""
    emb = cat(spark, sf_dir)["embeddings"]
    m = emb.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, HBOS_DIMS)).alias("dim", "xf"),
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    mm = m.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    b = m.join(F.broadcast(mm), "dim").select(
        "vec_id",
        "dim",
        F.least(
            F.floor(
                (F.col("x") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / float(HBOS_BINS))
            ).cast("bigint"),
            F.lit(HBOS_BINS - 1).cast("bigint"),
        ).alias("bin"),
    )
    dens = b.groupBy("dim", "bin").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    n = emb.agg(F.count(F.lit(1)).cast("double").alias("n"))
    sc = (
        b.join(F.broadcast(dens), ["dim", "bin"])
        .crossJoin(F.broadcast(n))
        .groupBy("vec_id")
        .agg(F.sum(-F.log(F.col("c") / F.col("n"))).alias("score"))
    )
    return (
        sc.select("vec_id", ratio(F.col("score")).alias("hbos"), "score")
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(HBOS_TOP)
        .drop("score")
    )


ml_hbos_outliers.__doc__ = ml_hbos_outliers.__doc__.format(
    d=HBOS_DIMS, b=HBOS_BINS, t=HBOS_TOP
)
