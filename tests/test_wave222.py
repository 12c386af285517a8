"""Wave 222 behavior gates beyond the registry oracle parity.

PDP must read a planted pure-f2 effect as a moving f2 curve and a
flat f1 curve; the token bucket must reproduce a hand-computed burst
scenario drop-for-drop.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderdate_s string, o_orderpriority string, o_totalprice double",
    ).select(
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority", "o_totalprice",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_pdp_isolates_the_real_feature(spark, tmp_path):
    from mister_spark.operators.extras222 import ml_partial_dependence

    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(350):
        day = (d0 + datetime.timedelta(days=i % 28)).strftime("%Y-%m-%d")
        g = (i % 5) + 1
        # value driven ONLY by priority; weekday is noise-free filler
        rows.append((day, f"{g}-P", 1000.0 * g))
    _write_orders(spark, tmp_path, rows)
    out = ml_partial_dependence(spark, str(tmp_path)).collect()
    f1 = sorted(
        [r for r in out if r["feature"] == "f1"], key=lambda r: r["grid_value"]
    )
    f2 = sorted(
        [r for r in out if r["feature"] == "f2"], key=lambda r: r["grid_value"]
    )
    assert len(f1) == 7 and len(f2) == 5
    # f1 (weekday) curve is FLAT — forcing weekday changes nothing
    assert max(r["pdp"] for r in f1) - min(r["pdp"] for r in f1) < 1e-6, f1
    # f2 (priority) curve moves with the planted effect and is
    # monotone increasing
    vals = [r["pdp"] for r in f2]
    assert vals[-1] - vals[0] > 2000, vals
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:])), vals
    # support counts are the marginals
    assert sum(r["n_support"] for r in f2) == 350


def _write_hourly_events(spark, tmp_path, hour_counts):
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    for h, n in enumerate(hour_counts):
        ts = (d0 + datetime.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S")
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_token_bucket_matches_hand_computation(spark, tmp_path):
    from mister_spark.operators.extras222 import ev_token_bucket

    # 10 hours: total 40 -> refill r=4, burst 12. Arrivals:
    # [4,4,4,16,16,4,0,0,4,(-8 filler)] hand-walk:
    # start tokens 12; h0: +4->12(cap), admit 4 -> 8 left... wait
    # follow op: tokens=min(t+r,burst) then admit.
    # last-hour event pins the 10-hour span (empty tail hours don't)
    counts = [4, 4, 4, 16, 10, 1, 0, 0, 0, 1]
    # total = 40, nh = 10 -> r = 4, burst = 12
    _write_hourly_events(spark, tmp_path, counts)
    r = ev_token_bucket(spark, str(tmp_path)).collect()[0]
    assert r["n_hours"] == 10 and r["refill_rate"] == 4, r
    assert r["burst_capacity"] == 12, r
    # walk: t=12 each refill capped; h0 admit4 t=8; h1 t=12 admit4
    # t=8; h2 t=12 admit4 t=8; h3 t=12 admit12 drop4 t=0; h4 t=4
    # admit4 drop6 t=0; h5 t=4 admit1 t=3; idle refills; h9 admit1
    assert r["dropped_total"] == 10, r
    assert r["admitted_total"] == 30, r
    assert r["worst_hour"] == "2024-01-01 04:00", r
    assert r["longest_throttle_streak"] == 2, r
    assert r["drop_rate"] == 0.25, r
