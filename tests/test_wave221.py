"""Wave 221 behavior gates beyond the registry oracle parity.

The VaR backtest must pass a well-spread breach series and fail the
independence test when breaches cluster; Kneedle must pick k=3 on a
planted three-cluster value distribution.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_lineitem_days(spark, tmp_path, day_revenues):
    rows = []
    d0 = datetime.date(2023, 1, 1)
    for day, rev in enumerate(day_revenues):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        rows.append((d, float(rev), 0.0))
    spark.createDataFrame(
        rows, "l_shipdate_s string, l_extendedprice double, l_discount double"
    ).select(
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
        "l_extendedprice", "l_discount",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_var_backtest_flags_clustered_breaches(spark, tmp_path):
    from mister_spark.operators.extras221 import fin_var_backtest

    # spread breaches: 100 days around 1000 with 5 isolated crashes
    revs, level = [], 1000.0
    for i in range(101):
        level = 1000.0 + 30.0 * ((i * 7) % 11 - 5)
        if i in (10, 30, 50, 70, 90):
            level -= 600.0
        revs.append(level)
    _write_lineitem_days(spark, tmp_path, revs)
    r = fin_var_backtest(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 100, r
    assert r["n_breaches"] == 5, r
    assert r["kupiec_p"] > 0.5, r
    # isolated breaches: independence holds
    assert r["independence_p"] > 0.2, r

    # clustered: the same 5 crashes on consecutive days
    revs = []
    for i in range(101):
        level = 1000.0 + 30.0 * ((i * 7) % 11 - 5)
        if 50 <= i <= 54:
            level -= 600.0 * (1 + 0.2 * (i % 2))
        revs.append(level)
    _write_lineitem_days(spark, tmp_path, revs)
    r = fin_var_backtest(spark, str(tmp_path)).collect()[0]
    assert r["christoffersen_lr"] > 3.8, r
    assert r["independence_p"] < 0.05, r


def test_kneedle_picks_planted_cluster_count(spark, tmp_path):
    from mister_spark.operators.extras221 import ml_kneedle_elbow

    # three tight, EQUALLY-SPACED value blobs (10k / 150k / 290k):
    # a 2-split must leave a merged pair's full spread as inertia,
    # so the Kneedle gap peaks at the true k=3
    rows = []
    for center in (10000.0, 150000.0, 290000.0):
        for i in range(120):
            rows.append((center + 500.0 * (i % 12),))
    spark.createDataFrame(rows, "o_totalprice double").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "orders.parquet"))
    out = {r["k"]: r for r in ml_kneedle_elbow(spark, str(tmp_path)).collect()}
    assert len(out) == 8
    inert = [out[k]["inertia"] for k in range(1, 9)]
    assert all(a >= b - 1e-6 for a, b in zip(inert, inert[1:])), inert
    # k=3 captures the blobs: inertia collapses there and the knee
    # names it
    assert out[3]["inertia"] < inert[0] / 50, inert
    assert out[1]["knee_k"] == 3, out[1]
