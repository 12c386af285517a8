"""Wave 192 behavior gates beyond the registry oracle parity.

The Theil decomposition must read zero on equal spends, put ALL
inequality between nations when within-nation spends are equal, and
satisfy within + between = total against an independent computation.
Expected shortfall must select the exact breach tail.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_theil_fixture(spark, tmp_path, spends_by_nation):
    """spends_by_nation: {nation_key: [customer spends]}. One order
    per customer carrying the whole spend."""
    custs, orders = [], []
    ck = 0
    for nk, spends in spends_by_nation.items():
        for s in spends:
            custs.append((ck, nk))
            orders.append((ck, float(s), "2024-01-05 00:00:00"))
            ck += 1
    spark.createDataFrame(custs, "c_custkey long, c_nationkey int").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "customer.parquet"))
    (
        spark.createDataFrame(
            orders, "o_custkey long, o_totalprice double, od string"
        )
        .select(
            "o_custkey",
            "o_totalprice",
            F.col("od").cast("timestamp").alias("o_orderdate"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "orders.parquet"))
    )


def test_theil_decomposition_identity(spark, tmp_path):
    from mister_spark.operators.extras192 import stat_theil_index

    # equal spends everywhere -> every component is exactly zero
    _write_theil_fixture(
        spark, tmp_path, {0: [100.0] * 4, 1: [100.0] * 4}
    )
    rows = stat_theil_index(spark, str(tmp_path)).collect()
    assert all(
        r["theil_group"] == 0.0
        and r["within_contrib"] == 0.0
        and r["between_contrib"] == 0.0
        for r in rows
    ), rows

    # within-nation equality, nations differ -> inequality is ALL
    # between: within contributions zero, between share positive
    _write_theil_fixture(
        spark, tmp_path, {0: [50.0] * 5, 1: [200.0] * 5}
    )
    rows = stat_theil_index(spark, str(tmp_path)).collect()
    assert all(r["within_contrib"] == 0.0 for r in rows), rows
    assert sum(r["between_contrib"] for r in rows) > 0.05, rows

    # mixed case: within + between must reproduce the total Theil
    spends = {0: [10.0, 30.0, 60.0], 1: [100.0, 100.0], 2: [5.0, 500.0]}
    _write_theil_fixture(spark, tmp_path, spends)
    rows = stat_theil_index(spark, str(tmp_path)).collect()
    flat = [s for v in spends.values() for s in v]
    mu = sum(flat) / len(flat)
    total = sum(x / mu * math.log(x / mu) for x in flat) / len(flat)
    got = sum(r["within_contrib"] + r["between_contrib"] for r in rows)
    assert abs(got - total) < 1e-4, (got, total)


def test_expected_shortfall_selects_the_breach_tail(spark, tmp_path):
    from mister_spark.operators.extras192 import fin_expected_shortfall

    # 41 days of revenue: flat at 1000 (zero returns) except two
    # planted crashes; returns around each crash are known exactly
    y = [1000.0] * 41
    y[10] = 800.0  # return -0.2, then +0.25 recovery
    y[30] = 900.0  # return -0.1, then +0.111... recovery
    d0 = datetime.date(2024, 1, 1)
    orders = [
        (i, y[i], f"{d0 + datetime.timedelta(days=i)} 00:00:00")
        for i in range(41)
    ]
    (
        spark.createDataFrame(
            orders, "o_custkey long, o_totalprice double, od string"
        )
        .select(
            "o_custkey",
            "o_totalprice",
            F.col("od").cast("timestamp").alias("o_orderdate"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "orders.parquet"))
    )
    r = fin_expected_shortfall(spark, str(tmp_path)).collect()[0]
    # 40 returns, k = ceil(0.05*40) = 2 -> VaR is the 2nd smallest
    # return (-0.1); the breach tail is {-0.2, -0.1}
    assert r["n_returns"] == 40, r
    assert r["var_95"] == -0.1, r
    assert r["breach_days"] == 2, r
    assert abs(r["es_95"] - (-0.15)) < 1e-6, r
    assert r["worst_return"] == -0.2, r
