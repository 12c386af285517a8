"""Wave 175: Iceberg merge-on-read deletes and Lin's concordance.

io_iceberg_mor_deletes audits the Iceberg v2 row-level delete flow:
a position-delete parquet file (file_path, pos) commits WITHOUT
rewriting any data file, and readers subtract the positions at scan
time — the merge-on-read half of the spec that copy-on-write tables
lack. stat_lin_ccc completes the method-comparison family
(stat_bland_altman, stat_deming_regression): Lin's concordance
correlation — how far the paired measurements sit from the y=x line,
precision x accuracy in one number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "stat_lin_ccc",
    oracle="""
    WITH m AS (SELECT CAST(embedding[1] AS DOUBLE) AS x,
                      CAST(embedding[2] AS DOUBLE) AS y
               FROM embeddings),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(x) AS mx, AVG(y) AS my,
                 AVG(x * x) AS mxx, AVG(y * y) AS myy,
                 AVG(x * y) AS mxy
          FROM m),
    c AS (SELECT n, mx, my,
                 mxx - mx * mx AS vx, myy - my * my AS vy,
                 mxy - mx * my AS cxy
          FROM s)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(2 * cxy / (vx + vy + (mx - my) * (mx - my))
                 * 10000 + 0.5) / 10000 AS ccc,
           FLOOR(cxy / SQRT(vx * vy) * 10000 + 0.5) / 10000
             AS pearson_r,
           FLOOR((2 * cxy / (vx + vy + (mx - my) * (mx - my)))
                 / (cxy / SQRT(vx * vy)) * 10000 + 0.5) / 10000
             AS accuracy_cb
    FROM c
    """,
)
def stat_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation coefficient between the first two
    embedding dimensions (the method-comparison pairing the
    Bland-Altman and Deming ops use): ccc = 2*s_xy / (s_x^2 + s_y^2 +
    (mean_x - mean_y)^2) — Pearson r (precision) times the bias
    correction factor C_b (accuracy), the decomposition reported
    alongside. Agreement with y=x, not just linearity: two methods can
    correlate perfectly yet disagree on every reading.

    Scale: one aggregate of five moments; everything downstream is
    closed-form arithmetic on a single row."""
    m = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    s = m.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
    )
    c = s.select(
        "n",
        "mx",
        "my",
        (F.col("mxx") - F.col("mx") * F.col("mx")).alias("vx"),
        (F.col("myy") - F.col("my") * F.col("my")).alias("vy"),
        (F.col("mxy") - F.col("mx") * F.col("my")).alias("cxy"),
    )
    ccc = (
        2
        * F.col("cxy")
        / (
            F.col("vx")
            + F.col("vy")
            + (F.col("mx") - F.col("my")) * (F.col("mx") - F.col("my"))
        )
    )
    r = F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy"))
    return c.select(
        F.col("n").cast("bigint").alias("n"),
        ratio(ccc).alias("ccc"),
        ratio(r).alias("pearson_r"),
        ratio(ccc / r).alias("accuracy_cb"),
    )


@query(
    "io_iceberg_mor_deletes",
    # Real oracle: the stacked merge-on-read contract reduces to two
    # price-band counts over orders — the first delete removes the
    # >200k rows, the overlapping second removes exactly the live
    # (150k, 200k] band, and every structural flag (no data rewrite,
    # reconciling counts, zero duplicate delete pairs) must hold.
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN o_totalprice > 200000
                               THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                      CAST(SUM(CASE WHEN o_totalprice > 150000
                                AND o_totalprice <= 200000
                               THEN 1 ELSE 0 END) AS BIGINT) AS d2
               FROM orders)
    SELECT n AS rows_before, n - d1 AS rows_after, d1 AS deleted_rows,
           d1 AS expected_deleted, CAST(0 AS BIGINT) AS still_matching,
           n AS time_travel_rows, CAST(1 AS INT) AS data_files_untouched,
           CAST(1 AS INT) AS counts_reconcile, d2 AS deleted_rows_2,
           d2 AS expected_deleted_2,
           CAST(1 AS INT) AS stacked_counts_reconcile,
           CAST(0 AS BIGINT) AS dup_delete_pairs
    FROM c
    """,
)
def io_iceberg_mor_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read audit: export a 2-version snapshot table to an
    Iceberg tree, issue a row-level delete (o_totalprice > 200000)
    through a POSITION DELETE file, and verify the v2 contract — no
    data file rewritten (byte-identical census before/after), the new
    snapshot subtracts exactly the matching rows at scan time, the
    PRE-delete snapshot still reads the full row set (time travel
    across a delete), and the delete file row count equals the rows
    removed. A SECOND, OVERLAPPING delete (o_totalprice > 150000, a
    superset predicate) then verifies the stacked-delete contract:
    already-deleted positions are never re-matched, (file_path, pos)
    pairs stay unique across every delete file, and
    rows_before - rows_after == sum of both reports' deleted_rows.

    Scale: the delete writes only (file_path, pos) pairs via a Spark
    job over `_metadata.row_index`; the read-side anti-join broadcasts
    the delete set. Data bytes are never rewritten — the whole point
    of merge-on-read."""
    import os
    import shutil
    import tempfile

    from mister_spark.sources.iceberg import (
        delete_where,
        export_iceberg,
        read_iceberg,
    )
    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="iceberg_mor_")
    try:
        t = SnapshotTable(
            spark, os.path.join(root, "t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.filter(F.col("o_orderkey") < 1000))
        t.append(orders.filter(F.col("o_orderkey") >= 1000))
        dest = os.path.join(root, "ice")
        export_iceberg(t, dest)
        before = read_iceberg(spark, dest)
        rows_before = before.count()
        expect_deleted = before.filter("o_totalprice > 200000").count()
        data_census = {
            p: os.path.getsize(os.path.join(dp, p))
            for dp in [os.path.join(root, "t", "data")]
            for p in sorted(os.listdir(dp))
        }
        pre_sid = 2  # version 1 (append head) -> snapshot-id 2
        report = delete_where(spark, dest, "o_totalprice > 200000")
        after = read_iceberg(spark, dest)
        rows_after = after.count()
        still_matching = after.filter("o_totalprice > 200000").count()
        time_travel_rows = read_iceberg(
            spark, dest, snapshot_id=pre_sid
        ).count()
        data_census2 = {
            p: os.path.getsize(os.path.join(dp, p))
            for dp in [os.path.join(root, "t", "data")]
            for p in sorted(os.listdir(dp))
        }
        # stacked, OVERLAPPING delete: the superset predicate re-covers
        # every already-deleted row; only live rows may match
        expect_deleted2 = after.filter("o_totalprice > 150000").count()
        report2 = delete_where(spark, dest, "o_totalprice > 150000")
        rows_after2 = read_iceberg(spark, dest).count()
        from mister_spark.sources.iceberg import (
            _snapshot_files,
            current_metadata,
        )

        md = current_metadata(dest)
        snap = next(
            s
            for s in md["snapshots"]
            if s["snapshot-id"] == md["current-snapshot-id"]
        )
        _, delete_paths = _snapshot_files(snap)
        dup_delete_pairs = (
            spark.read.parquet(*delete_paths)
            .groupBy("file_path", "pos")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(rows_before),
                int(rows_after),
                int(report["deleted_rows"]),
                int(expect_deleted),
                int(still_matching),
                int(time_travel_rows),
                int(data_census == data_census2),
                int(rows_before - rows_after == report["deleted_rows"]),
                int(report2["deleted_rows"]),
                int(expect_deleted2),
                int(
                    rows_before - rows_after2
                    == report["deleted_rows"] + report2["deleted_rows"]
                ),
                int(dup_delete_pairs),
            )
        ],
        "rows_before long, rows_after long, deleted_rows long, "
        "expected_deleted long, still_matching long, time_travel_rows long, "
        "data_files_untouched int, counts_reconcile int, "
        "deleted_rows_2 long, expected_deleted_2 long, "
        "stacked_counts_reconcile int, dup_delete_pairs long",
    )
