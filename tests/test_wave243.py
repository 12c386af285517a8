"""Wave 243 behavior gates beyond the registry oracle parity.

The two-asset frontier must put the minimum-variance waist in the
interior for anti-correlated markets and at an endpoint for
perfectly co-moving ones; the diversification ratio must read
independent units near sqrt(n) and lockstep units at 1.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_panel(spark, tmp_path, cells):
    cust, orders = [], []
    cust_of = {}
    oid = 0
    d0 = datetime.date(2024, 1, 1)
    for z, day, price in cells:
        if z not in cust_of:
            cust_of[z] = len(cust_of) + 1
            cust.append((cust_of[z], z))
        oid += 1
        orders.append(
            (
                oid, cust_of[z],
                (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d"),
                price,
            )
        )
    base = str(tmp_path)
    spark.createDataFrame(cust, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderdate_s string, "
        "o_totalprice double",
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))


def test_frontier_waist_follows_correlation(spark, tmp_path):
    from mister_spark.operators.extras243 import fin_two_asset_frontier

    # anti-correlated equal-vol markets: min-var weight = 0.5 and
    # the 50/50 mix has ~zero volatility
    wave = [300.0 * ((i % 6) - 2.5) for i in range(30)]
    cells = []
    for day, w in enumerate(wave):
        cells.append((1, day, 5000.0 + w))
        cells.append((2, day, 5000.0 - w))
    _write_panel(spark, tmp_path, cells)
    out = {r["weight_a"]: r for r in fin_two_asset_frontier(spark, str(tmp_path)).collect()}
    assert abs(out[0.5]["min_var_weight_a"] - 0.5) < 0.01, out[0.5]
    assert out[0.5]["daily_vol"] < out[0.0]["daily_vol"] / 10, out
    assert out[0.5]["daily_vol"] < out[1.0]["daily_vol"] / 10, out

    # lockstep markets, a twice as volatile: min-var pins to all-b
    cells = []
    for day, w in enumerate(wave):
        cells.append((1, day, 5000.0 + 2 * w))
        cells.append((2, day, 5000.0 + w))
    _write_panel(spark, tmp_path, cells)
    out = {r["weight_a"]: r for r in fin_two_asset_frontier(spark, str(tmp_path)).collect()}
    assert out[0.0]["min_var_weight_a"] == 0.0, out[0.0]


def test_diversification_ratio_reads_comovement(spark, tmp_path):
    from mister_spark.operators.extras243 import fin_diversification_ratio

    # four units with orthogonal day-cycles: near-independent
    cells = []
    for z in range(4):
        for day in range(32):
            # staggered, UNEQUAL bumps: strong negative correlation
            # without the exact-cancellation degenerate
            bump = (2000.0 + 300.0 * z) if (day % 4) == z else 0.0
            cells.append((z, day, 3000.0 + bump))
    _write_panel(spark, tmp_path, cells)
    r = fin_diversification_ratio(spark, str(tmp_path)).collect()[0]
    assert r["n_units"] == 4, r
    assert r["independence_bound"] == round(math.sqrt(4), 4), r
    # orthogonal bumps are negatively correlated (one fires per
    # day), so DR can even exceed sqrt(n); it must at least be big
    assert r["diversification_ratio"] > 1.5, r

    # lockstep: everyone bumps the SAME days -> DR = 1
    cells = []
    for z in range(4):
        for day in range(32):
            bump = 2000.0 if (day % 4) == 0 else 0.0
            cells.append((z, day, 3000.0 + bump))
    _write_panel(spark, tmp_path, cells)
    r = fin_diversification_ratio(spark, str(tmp_path)).collect()[0]
    assert abs(r["diversification_ratio"] - 1.0) < 0.01, r
