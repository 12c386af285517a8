"""Iterative ML on embeddings: Lloyd's k-means, DataFrame-native.

The model (k centroids) lives on the driver between iterations — it IS
driver-sized by definition — while every data-sized step (assignment,
partial sums) is a distributed DataFrame op. This is the same
model-small/data-big split MLlib uses, re-expressed with the public
DataFrame API only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

K = 10
ITERS = 4


def _sq_dist(a, b):
    """Σ (a_i - b_i)² as a JVM expression (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    spark: SparkSession, sf_dir: str, k: int = K, iters: int = ITERS
) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means over the embeddings table. Returns the final
    assignment profile (cid, n, inertia) and the per-iteration total
    inertia history (monotonically non-increasing — pinned in tests).

    Scale design: each iteration is (1) a broadcast of k centroid
    arrays into a map-side assignment — `min_by` over a k-way exploded
    score needs no shuffle of the data — and (2) ONE partial-agg
    shuffle keyed on (cid, dim) to average the new centroids. The k×d
    model is collected to the driver per iteration (it is O(k·d), not
    O(data)); lineage is cut there, so 100 iterations don't stack 100
    plans. Init is the k lowest vec_ids — deterministic, seed-free."""
    emb = cat(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    cent_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(k).collect()
    ]
    centroids = [(i, v) for i, (_, v) in enumerate(cent_rows)]
    history: list[float] = []
    assign = None
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(centroids, "cid int, cvec array<double>")
        )
        scored = emb.crossJoin(cdf).select(
            "vec_id",
            "embedding",
            "cid",
            _sq_dist(F.col("embedding"), F.col("cvec")).alias("d2"),
        )
        assign = scored.groupBy("vec_id").agg(
            F.min_by("cid", "d2").alias("cid"),
            F.min("d2").alias("d2"),
            F.first("embedding").alias("embedding"),
        )
        history.append(assign.agg(F.sum("d2")).collect()[0][0])
        new_c = (
            assign.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        centroids = [
            (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in new_c.collect()
        ]
    profile = assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(F.sum("d2")).alias("inertia"),
    )
    return profile, history


@query("ml_kmeans")  # iterative algorithm → rows-only; pytest invariants
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size/inertia profile of k-means(k=10, 4 iters) over the
    embedding corpus — see kmeans() for the scale design."""
    profile, _ = kmeans(spark, sf_dir)
    return profile
