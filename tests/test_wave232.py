"""Wave 232 behavior gates beyond the registry oracle parity.

Harmonic regression must recover a planted sinusoid's amplitude and
phase (and read a flat series as r2 ~ 0); the HLL estimates must
track the exact distinct count within a few theoretical standard
errors, tightening as registers grow.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 05:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_harmonic_fit_recovers_planted_sinusoid(spark, tmp_path):
    from mister_spark.operators.extras232 import ev_harmonic_regression

    # y = 100 + 30 cos(2 pi t / 7 - 1.0): amp 30, phase +1.0
    counts = [
        max(1, round(100 + 30 * math.cos(2 * math.pi * t / 7 - 1.0)))
        for t in range(56)
    ]
    _write_daily_events(spark, tmp_path, counts)
    r = ev_harmonic_regression(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 56, r
    assert abs(r["amp_1"] - 30) < 1.5, r
    # the op's t is EPOCH days, so the recovered phase is the planted
    # one shifted by 2*pi*(epoch_day_of_2024_01_01 mod 7)/7
    epoch0 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    want = (1.0 + 2 * math.pi * (epoch0 % 7) / 7) % (2 * math.pi)
    if want > math.pi:
        want -= 2 * math.pi
    assert abs(r["phase_1"] - want) < 0.1, (r, want)
    assert r["amp_2"] < 2, r
    assert r["r2"] > 0.95, r

    # flat: nothing to fit
    _write_daily_events(spark, tmp_path, [80] * 56)
    r = ev_harmonic_regression(spark, str(tmp_path)).collect()[0]
    assert r["amp_1"] < 0.01 and r["r2"] == 0.0, r


def _write_users(spark, tmp_path, n_users, events_per=3):
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    for u in range(n_users):
        for k in range(events_per):
            ts = (d0 + datetime.timedelta(minutes=u % 800, hours=k)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts, u))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_hll_estimates_track_exact_within_theory(spark, tmp_path):
    from mister_spark.operators.extras232 import sketch_hll_error_curve

    _write_users(spark, tmp_path, 5000)
    out = {r["register_bits"]: r for r in sketch_hll_error_curve(spark, str(tmp_path)).collect()}
    assert set(out) == {4, 6, 8, 10}
    for b, r in out.items():
        assert r["exact_distinct"] == 5000, r
        # one fixed hash draw: allow 4 theoretical standard errors
        assert r["rel_error"] <= 4 * r["theory_rse"] + 0.01, r
    # more registers -> tighter theory bound, and the m=1024 estimate
    # lands within ~10%
    assert out[10]["theory_rse"] < out[4]["theory_rse"] / 5
    assert out[10]["rel_error"] < 0.1, out[10]
