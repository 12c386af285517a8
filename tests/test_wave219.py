"""Wave 219 behavior gates beyond the registry oracle parity.

Spectral bisection must find a planted two-clique bridge cut exactly;
Newey-West must inflate the trend se under persistent residuals and
leave it ~unchanged under rapidly-alternating ones.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_trade(spark, tmp_path, weighted_edges):
    """weighted_edges: list of (src_nation, dst_nation, copies)."""
    sup, cus, orders, li = [], [], [], []
    sup_of, cus_of = {}, {}
    oid = 0
    for s, d, w in weighted_edges:
        if s not in sup_of:
            sup_of[s] = len(sup_of) + 1
            sup.append((sup_of[s], s))
        if d not in cus_of:
            cus_of[d] = len(cus_of) + 1
            cus.append((cus_of[d], d))
        for _ in range(w):
            oid += 1
            orders.append((oid, cus_of[d]))
            li.append((oid, sup_of[s]))
    base = str(tmp_path)
    spark.createDataFrame(sup, "s_suppkey long, s_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(li, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "lineitem.parquet"))


def test_bisection_finds_planted_bridge(spark, tmp_path):
    from mister_spark.operators.extras219 import graph_spectral_bisection

    heavy = []
    blob_a, blob_b = [0, 1, 2, 3], [10, 11, 12, 13]
    for blob in (blob_a, blob_b):
        for i, x in enumerate(blob):
            for y in blob[i + 1 :]:
                heavy.append((x, y, 10))
    heavy.append((3, 10, 10))  # the bridge
    # light noise edges on disjoint nodes pull the mean down so the
    # 2x-mean threshold keeps exactly the heavy graph
    noise = [(20 + 2 * i, 21 + 2 * i, 1) for i in range(17)]
    _write_trade(spark, tmp_path, heavy + noise)
    r = graph_spectral_bisection(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 8 and r["n_edges"] == 13, r
    assert r["cut_edges"] == 1, r
    assert {r["side_a"], r["side_b"]} == {4}, r
    # cut 1 over min side volume 13 (3+3+3+4)
    assert r["conductance"] == 0.0769, r


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 08:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_newey_west_prices_serial_correlation(spark, tmp_path):
    from mister_spark.operators.extras219 import stat_newey_west

    # persistent residuals: slow 16-day square wave around the trend
    counts = [60 + i // 4 + (12 if (i // 8) % 2 == 0 else -12) for i in range(64)]
    _write_daily_events(spark, tmp_path, counts)
    r = stat_newey_west(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 64 and r["bartlett_lag"] >= 3, r
    assert r["se_inflation"] > 1.5, r
    assert r["se_hac"] > r["se_ols"], r

    # rapidly alternating residuals: HAC should NOT inflate
    counts = [60 + i // 4 + 6 * ((i % 2) * 2 - 1) for i in range(64)]
    _write_daily_events(spark, tmp_path, counts)
    r = stat_newey_west(spark, str(tmp_path)).collect()[0]
    assert r["se_inflation"] < 1.1, r
