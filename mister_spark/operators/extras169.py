"""Wave 169: Hodges-Lehmann robust location and Iceberg round-trip.

stat_hodges_lehmann computes the Hodges-Lehmann estimator (median of
pairwise Walsh averages) per return flag — the robust location the
Wilcoxon test implicitly estimates, ~95% as efficient as the mean at
the normal yet breakdown-resistant; io_iceberg_roundtrip productizes
the Iceberg-spec metadata export (sources/iceberg.py) as an audited
snapshot→Iceberg→re-read flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money
from mister_spark.registry import query


@query(
    "stat_hodges_lehmann",
    oracle="""
    WITH c AS (SELECT l_returnflag AS flag, l_quantity AS v,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM lineitem GROUP BY 1, 2),
    p AS (SELECT a.flag, (a.v + b.v) / 2 AS w,
                 CASE WHEN a.v < b.v THEN a.c * b.c
                      ELSE a.c * (a.c + 1) / 2 END AS wt
          FROM c a JOIN c b ON a.flag = b.flag AND a.v <= b.v),
    c2 AS (SELECT flag, w, wt,
                  SUM(wt) OVER (PARTITION BY flag ORDER BY w
                                ROWS UNBOUNDED PRECEDING) AS cumw,
                  SUM(wt) OVER (PARTITION BY flag) AS totw
           FROM p)
    SELECT flag, CAST(MIN(totw) AS BIGINT) AS walsh_pairs,
           FLOOR(MIN(CASE WHEN 2 * cumw >= totw THEN w END) * 100 + 0.5)
             / 100 AS hl_estimate
    FROM c2 GROUP BY 1 ORDER BY 1
    """,
)
def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimate of l_quantity per return flag:
    the weighted median of all Walsh averages (v_i + v_j)/2, i <= j
    (self-pairs included, the one-sample pseudo-median convention).
    The pairwise blow-up never happens on rows: quantities collapse to
    the <=50 distinct values with counts first, so the 'all pairs' join
    is 1275 value pairs per flag with INTEGER pair weights (c_i*c_j,
    or c(c+1)/2 on the diagonal) — exact bigint arithmetic on both
    engines, order-independent, no float cumsum at the median boundary.

    Scale: one partial-agg shuffle collapses the fact table; the pair
    join and cumulative window run on the |distinct|^2-bounded frame
    (value-domain-sized, not data-sized) partitioned by flag."""
    li = cat(spark, sf_dir)["lineitem"]
    c = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint()
    # ^ |distinct quantity| x flag rows (~150); read by both join sides
    a = c.select("flag", F.col("v").alias("v1"), F.col("c").alias("c1"))
    b = c.select(
        F.col("flag").alias("flag_b"),
        F.col("v").alias("v2"),
        F.col("c").alias("c2"),
    )
    p = (
        a.join(
            F.broadcast(b),
            (F.col("flag") == F.col("flag_b")) & (F.col("v1") <= F.col("v2")),
        )
        .select(
            "flag",
            ((F.col("v1") + F.col("v2")) / 2).alias("w"),
            F.when(
                F.col("v1") < F.col("v2"), F.col("c1") * F.col("c2")
            )
            .otherwise(F.col("c1") * (F.col("c1") + 1) / 2)
            .cast("bigint")
            .alias("wt"),
        )
    )
    wcum = W.partitionBy("flag").orderBy("w").rowsBetween(
        W.unboundedPreceding, 0
    )
    c2 = p.select(
        "flag",
        "w",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(W.partitionBy("flag")).alias("totw"),
    )
    return (
        c2.groupBy("flag")
        .agg(
            F.min("totw").cast("bigint").alias("walsh_pairs"),
            money(
                F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("w")))
            ).alias("hl_estimate"),
        )
        .orderBy("flag")
    )


@query(
    "io_iceberg_roundtrip",
    # Real oracle: the 3-version script is fixed (one manifest +
    # manifest list per version), every version must re-read
    # row-identically through the Iceberg tree, and the current rows
    # reduce to the [400,800] delete-band count over orders.
    oracle="""
    SELECT CAST(3 AS INT) AS versions,
           (SELECT CAST(COUNT(*) - SUM(CASE WHEN o_orderkey
                        BETWEEN 400 AND 800 THEN 1 ELSE 0 END)
                   AS BIGINT) FROM orders) AS rows_current,
           CAST(1 AS INT) AS all_versions_match,
           CAST(3 AS INT) AS manifest_files,
           CAST(3 AS INT) AS manifest_lists
    """,
)
def io_iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table → Iceberg v2 metadata tree → re-read, audited:
    build a 3-version table (create / append / copy-on-write
    delete_range), export the Iceberg metadata (sources/iceberg.py),
    then resolve EVERY version through the Iceberg tree and compare it
    row-for-row against the native snapshot read. Emits one audit row:
    version count, current rows through each path, whether every
    version matched exactly, and the metadata-file census.

    Scale: export is a metadata walk (parquet footers only — no data
    read); the row comparisons are Spark exceptAll jobs. At 100 TB the
    same tree costs O(#files) JSON writes while the data never moves."""
    import os
    import shutil
    import tempfile

    from mister_spark.sources.iceberg import export_iceberg, read_iceberg
    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="iceberg_rt_")
    try:
        t = SnapshotTable(
            spark, os.path.join(root, "t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.filter(F.col("o_orderkey") < 1000))
        t.append(orders.filter(F.col("o_orderkey") >= 1000))
        t.delete_range("o_orderkey", 400, 800)
        dest = os.path.join(root, "ice")
        export_iceberg(t, dest)
        versions = t.versions()
        all_match = 1
        for v in versions:
            ice = read_iceberg(spark, dest, snapshot_id=v + 1)
            native = t.read(version=v)
            if (
                ice.exceptAll(native).count() != 0
                or native.exceptAll(ice).count() != 0
            ):
                all_match = 0
        meta_files = sorted(os.listdir(os.path.join(dest, "metadata")))
        manifests = sum(
            1 for f in meta_files if f.startswith("manifest-")
        )
        mlists = sum(1 for f in meta_files if f.startswith("snap-"))
        rows_current = read_iceberg(spark, dest).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(versions),
                int(rows_current),
                all_match,
                manifests,
                mlists,
            )
        ],
        "versions int, rows_current long, all_versions_match int, "
        "manifest_files int, manifest_lists int",
    )
