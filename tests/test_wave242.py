"""Wave 242 behavior gates beyond the registry oracle parity.

CUSUM-of-squares must localize a planted volatility break the mean
never shows, and pass constant-variance series; the Bloom FPR curve
must track theory and shrink with bits-per-key.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 12:30:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_cusum_squares_sees_volatility_breaks(spark, tmp_path):
    from mister_spark.operators.extras242 import stat_cusum_squares

    # same mean (~50) throughout; quiet +-2 for 30 days, wild +-30
    # after — a mean detector sees nothing
    quiet = [50 + (2 if i % 2 == 0 else -2) for i in range(30)]
    wild = [50 + (30 if i % 2 == 0 else -30) for i in range(30)]
    _write_daily_events(spark, tmp_path, quiet + wild)
    r = stat_cusum_squares(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 60, r
    assert r["variance_break"] == 1, r
    # the break is found at the end of the quiet regime
    assert "2024-01-2" in r["change_day"] or "2024-01-30" == r["change_day"], r
    assert r["max_abs_d"] > r["critical_band"] * 1.9, r

    # constant variance: no break
    _write_daily_events(spark, tmp_path, quiet * 2)
    r = stat_cusum_squares(spark, str(tmp_path)).collect()[0]
    assert r["variance_break"] == 0, r


def _write_users(spark, tmp_path, n_users):
    rows = []
    d0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    for u in range(n_users):
        ts = (d0 + datetime.timedelta(minutes=u % 600)).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        rows.append((u, ts, u))
    (
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_bloom_fpr_tracks_theory(spark, tmp_path):
    from mister_spark.operators.extras242 import sketch_bloom_fpr_curve

    _write_users(spark, tmp_path, 3000)
    out = {r["bits_per_key"]: r for r in sketch_bloom_fpr_curve(spark, str(tmp_path)).collect()}
    assert set(out) == {4, 8, 12, 16}
    # FPR shrinks monotonically with the bit budget
    fprs = [out[b]["measured_fpr"] for b in (4, 8, 12, 16)]
    assert all(a >= b for a, b in zip(fprs, fprs[1:])), fprs
    # measured within a small absolute band of theory at every size
    for b, r in out.items():
        assert abs(r["measured_fpr"] - r["theory_fpr"]) < 0.03, r
    # 4 bits/key with k=3 is leaky; 16 bits/key is tight
    assert out[4]["measured_fpr"] > 0.1, out[4]
    assert out[16]["measured_fpr"] < 0.03, out[16]
