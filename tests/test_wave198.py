"""Wave 198 behavior gates beyond the registry oracle parity.

SampEn must read near-zero on perfectly regular series and higher on
noise; transfer entropy must name the true driver when one series is
a lagged deterministic copy of the other, and stay near zero when the
two series are independent.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, per_day):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def _bit(tag, i):
    return hashlib.md5(f"{tag}:{i}".encode()).digest()[0] & 1


def test_sample_entropy_orders_regular_vs_noise(spark, tmp_path):
    from mister_spark.operators.extras198 import ev_sample_entropy

    # constant series: sd=0 -> tol=0, every template matches; SampEn
    # is the tiny -ln(C(n-3,2)/C(n-2,2)) finite-size term, near 0
    _write_daily_events(spark, tmp_path, [50] * 40)
    r = ev_sample_entropy(spark, str(tmp_path)).collect()[0]
    assert r["tolerance_r"] == 0.0 and r["sampen"] < 0.1, r

    # strict 2-cycle far beyond tolerance: still perfectly regular
    _write_daily_events(
        spark, tmp_path, [100 if d % 2 else 20 for d in range(60)]
    )
    regular = ev_sample_entropy(spark, str(tmp_path)).collect()[0]
    assert regular["sampen"] < 0.2, regular

    # hash noise: matching 2-day shapes stop matching at length 3
    _write_daily_events(
        spark,
        tmp_path,
        [
            20 + hashlib.md5(f"se:{d}".encode()).digest()[0]
            for d in range(60)
        ],
    )
    noisy = ev_sample_entropy(spark, str(tmp_path)).collect()[0]
    assert noisy["sampen"] > regular["sampen"] + 0.3, (regular, noisy)


def _write_typed_events(spark, tmp_path, day_type_counts):
    """day_type_counts: list of dict event_type -> count per day."""
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, counts in enumerate(day_type_counts):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for etype, n in counts.items():
            for _ in range(n):
                rows.append((eid, ts, etype))
                eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_transfer_entropy_names_the_driver(spark, tmp_path):
    from mister_spark.operators.extras198 import ev_transfer_entropy

    # purchases copy YESTERDAY's click state: click drives purchase
    click_bits = [_bit("drv", d) for d in range(60)]
    days = []
    for d in range(60):
        c = 100 if click_bits[d] else 10
        p = 80 if (d > 0 and click_bits[d - 1]) else 8
        days.append({"click": c, "purchase": p})
    _write_typed_events(spark, tmp_path, days)
    r = ev_transfer_entropy(spark, str(tmp_path)).collect()[0]
    assert r["dominant_direction"] == "click->purchase", r
    assert r["te_click_to_purchase"] > 0.4, r
    assert (
        r["te_click_to_purchase"] > r["te_purchase_to_click"] + 0.2
    ), r


def test_transfer_entropy_near_zero_when_independent(spark, tmp_path):
    from mister_spark.operators.extras198 import ev_transfer_entropy

    days = [
        {
            "click": 100 if _bit("a", d) else 10,
            "purchase": 80 if _bit("b", d) else 8,
        }
        for d in range(120)
    ]
    _write_typed_events(spark, tmp_path, days)
    r = ev_transfer_entropy(spark, str(tmp_path)).collect()[0]
    assert r["te_click_to_purchase"] < 0.1, r
    assert r["te_purchase_to_click"] < 0.1, r
