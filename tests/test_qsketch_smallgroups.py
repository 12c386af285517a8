"""Small-group overflow guard for the qsketch hash-threshold sample.

With K = 1024 and a group of n_g <= 128 rows, the unguarded threshold
(2^60 // n_g) * K is >= 2^63 and overflows BIGINT.  SQL `OR` has no
evaluation-order guarantee (DuckDB's adaptive conjunct reordering can
evaluate the product branch first), so both qs_sample and
qs_oracle_sample guard the keep-all branch with CASE/WHEN.  This test
drives a fine-grained grouping — every group tiny — through BOTH
engines and checks they keep every row without erroring.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mister_spark.functions.qsketch import qs_oracle_sample, qs_sample

SF = "/root/testdata/sf0.001"


def test_small_groups_keep_all_rows_both_engines(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n = cust.count()
    # group by the key itself -> every group has exactly 1 row, the
    # worst case for the overflow ((2^60 // 1) * 1024 >> 2^63)
    sampled = qs_sample(cust, ["c_custkey"], F.col("c_custkey"))
    assert sampled.count() == n

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS "
        f"SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    sql = (
        "WITH "
        + qs_oracle_sample("customer", "c_custkey", "c_custkey")
        + " SELECT COUNT(*) AS n FROM qs_s"
    )
    assert con.execute(sql).fetchone()[0] == n
    con.close()


def test_large_group_sample_agrees_across_engines(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    s = qs_sample(orders, [], F.col("o_orderkey"))
    spark_keys = {r["o_orderkey"] for r in s.select("o_orderkey").collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS "
        f"SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    sql = (
        "WITH "
        + qs_oracle_sample("orders", "", "o_orderkey")
        + " SELECT o_orderkey FROM qs_s"
    )
    duck_keys = {r[0] for r in con.execute(sql).fetchall()}
    con.close()
    assert spark_keys == duck_keys
    assert len(spark_keys) > 0
