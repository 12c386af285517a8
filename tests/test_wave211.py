"""Wave 211 behavior gates beyond the registry oracle parity.

Jonckheere-Terpstra must fire on a planted monotone priority->value
trend and stay quiet when the groups share one distribution; Pettitt
must locate a planted level shift to the day and read homogeneous
series as no-change.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_jonckheere_fires_on_ordered_trend_only(spark, tmp_path):
    from mister_spark.operators.extras211 import stat_jonckheere_terpstra

    # planted: value grows with the priority digit (1-URGENT cheapest)
    rows = []
    for g in range(1, 6):
        for i in range(40):
            rows.append((f"{g}-P", 10000.0 * g + 997.0 * (i % 7)))
    _write_orders(spark, tmp_path, rows)
    r = stat_jonckheere_terpstra(spark, str(tmp_path)).collect()[0]
    assert r["n_orders"] == 200 and r["n_groups"] == 5, r
    assert r["jt_stat"] > r["mean_jt"], r
    assert r["z"] > 5 and r["p_value"] < 1e-4, r

    # null: every group drawn from the same value cycle
    rows = [
        (f"{g}-P", 10000.0 + 1009.0 * ((7 * g + i) % 23))
        for g in range(1, 6)
        for i in range(40)
    ]
    _write_orders(spark, tmp_path, rows)
    r = stat_jonckheere_terpstra(spark, str(tmp_path)).collect()[0]
    assert abs(r["z"]) < 2.5 and r["p_value"] > 0.01, r


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 12:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_pettitt_locates_planted_shift(spark, tmp_path):
    from mister_spark.operators.extras211 import ev_pettitt_test

    # 30 days at ~10/day then 30 days at ~25/day; noise keeps ranks
    # distinct but never crosses the shift
    counts = [10 + (i % 3) for i in range(30)] + [
        25 + (i % 3) for i in range(30)
    ]
    _write_daily_events(spark, tmp_path, counts)
    r = ev_pettitt_test(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 60, r
    assert r["change_date"] == "2024-01-30", r
    assert r["p_value"] < 0.001, r
    assert r["mean_before"] < 12 and r["mean_after"] > 24, r

    # homogeneous cycle: no shift to find
    _write_daily_events(spark, tmp_path, [15 + (i % 4) for i in range(60)])
    r = ev_pettitt_test(spark, str(tmp_path)).collect()[0]
    assert r["p_value"] > 0.1, r
