"""Wave 220 behavior gates beyond the registry oracle parity.

The scan must name a planted nation x month-window outbreak exactly
and read a uniform grid as low-LLR; Cochrane-Orcutt must estimate a
planted AR(1) rho, recover the trend slope, and leave transformed
residuals with Durbin-Watson near 2.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders_nations(spark, tmp_path, cells):
    """cells: list of (nationkey, year, month, n_orders)."""
    cust, orders = [], []
    cust_of = {}
    oid = 0
    nations = sorted({z for z, *_ in cells})
    for z, y, m, n in cells:
        if z not in cust_of:
            cust_of[z] = len(cust_of) + 1
            cust.append((cust_of[z], z))
        for _ in range(n):
            oid += 1
            orders.append((oid, cust_of[z], f"{y:04d}-{m:02d}-15"))
    base = str(tmp_path)
    spark.createDataFrame(cust, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate_s string"
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(
        [(z, f"NATION_{z}") for z in nations], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(os.path.join(base, "nation.parquet"))


def test_scan_names_planted_outbreak(spark, tmp_path):
    from mister_spark.operators.extras220 import stat_kulldorff_scan

    # 5 nations x 12 months at 10 orders; nation 2 triples in Mar-May
    cells = []
    for z in range(5):
        for m in range(1, 13):
            n = 10
            if z == 2 and m in (3, 4, 5):
                n = 30
            cells.append((z, 2024, m, n))
    _write_orders_nations(spark, tmp_path, cells)
    r = stat_kulldorff_scan(spark, str(tmp_path)).collect()[0]
    assert r["cluster_nation"] == "NATION_2", r
    assert r["cluster_start"] == "2024-03" and r["cluster_end"] == "2024-05", r
    assert r["cluster_orders"] == 90, r
    # marginal conditioning absorbs part of the raw excess; ~9 is a
    # decisive scan LLR at this grid size
    assert r["llr"] > 5, r

    # uniform grid: nothing stands out
    _write_orders_nations(
        spark, tmp_path,
        [(z, 2024, m, 10) for z in range(5) for m in range(1, 13)],
    )
    r = stat_kulldorff_scan(spark, str(tmp_path)).collect()[0]
    assert r["llr"] < 1.0, r


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 07:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_cochrane_orcutt_whitens_ar1_residuals(spark, tmp_path):
    from mister_spark.operators.extras220 import stat_cochrane_orcutt

    # trend 1/day + AR(1)-ish residual: slow exponential-decay swings
    resid, level = [], 20.0
    shocks = [14, -11, 8, -13, 12, -9, 15, -12]
    for i in range(64):
        if i % 8 == 0:
            level = shocks[(i // 8) % len(shocks)]
        else:
            level = level * 0.8
        resid.append(level)
    counts = [max(1, round(100 + i + r)) for i, r in enumerate(resid)]
    _write_daily_events(spark, tmp_path, counts)
    r = stat_cochrane_orcutt(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 64, r
    assert r["rho"] > 0.4, r
    # both estimates see the planted 1/day trend
    assert 0.7 < r["slope_ols"] < 1.3 and 0.7 < r["slope_co"] < 1.3, r
    # the correction whitens: DW of transformed residuals near 2
    assert 1.5 < r["dw_after"] < 2.5, r
