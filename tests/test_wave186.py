"""Wave 186 behavior gates beyond the registry oracle parity.

The W1 operator's two-phase prefix sum must survive EMPTY bucket
indices (duplicate approx-percentile boundaries leave bucket numbers
unpopulated when distinct values << bucket count): the cross-bucket
gap must reach the next NON-EMPTY bucket's min value, exactly like the
oracle's global LEAD. This fixture has 7 distinct values against 32
buckets, so most buckets are empty and several gaps span them.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_wasserstein_exact_with_empty_buckets(spark, tmp_path):
    import duckdb

    import __spark_entry__ as e
    from mister_spark.operators.extras186 import stat_wasserstein_1d

    vals = [1.0, 1.0, 2.0, 5.0, 9.0, 9.0, 12.0, 20.0, 20.0, 33.0] * 4
    rows = [
        (i, "click" if i % 2 == 0 else "view", v, i % 5)
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double, user_id long"
    ).withColumn("ts", F.lit("2024-01-01").cast("timestamp")).withColumn(
        "props", F.lit("{}")
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    got = tuple(stat_wasserstein_1d(spark, str(tmp_path)).collect()[0])

    con = duckdb.connect()
    con.execute(
        "create table events(event_id bigint, event_type varchar,"
        " value double)"
    )
    con.executemany(
        "insert into events values (?, ?, ?)",
        [(i, t, v) for i, t, v, _ in rows],
    )
    want = con.execute(e.oracle_sql()["stat_wasserstein_1d"]).fetchall()[0]
    assert got == tuple(want), (got, want)
