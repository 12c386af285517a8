"""Bucketed-table layout: the shuffle-free co-located join path.

At 100 TB the single biggest shuffle in the workload is fact-fact joins
(lineitem ⋈ orders on orderkey). Writing both tables bucketed by the
join key with the same bucket count lets every subsequent join run with
ZERO exchange — each task reads matching buckets from both sides. The
write pays one shuffle once; every downstream join amortizes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.
    Idempotent: drops the table and any orphaned warehouse location left
    by a previous session (managed-table locations outlive the in-memory
    catalog in a non-Hive deployment)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = warehouse.removeprefix("file:") + "/" + table.lower()
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_by)
    if sort:
        w = w.sortBy(bucket_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both exchanges
    (verified by tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
