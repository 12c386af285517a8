"""Wave 245 behavior gates beyond the registry oracle parity.

DTW must read a pure phase shift as near-equality (ratio << 1) while
the lockstep L1 explodes, score identical series at exactly zero, and
never exceed the lockstep distance. The circular-hour stats must call
a one-hour spike (resultant 1, tiny Rayleigh p) and stay quiet on a
uniform clock.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: (event_type, day_idx, hour, n_copies)."""
    out, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for etype, day, hour, n in rows:
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            out.append((eid, f"{d} {hour:02d}:00:00", etype))
            eid += 1
    (
        spark.createDataFrame(
            out, "event_id long, ts_s string, event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_dtw_reads_phase_shift_as_shape_match(spark, tmp_path):
    from mister_spark.operators.extras245 import stat_dtw_daily

    # clicks carry a spiky weekly-ish pattern; views repeat it 2 days
    # later — lockstep L1 is large, the warped alignment nearly free
    pattern = [10, 10, 80, 10, 10, 60, 10, 10, 80, 10, 10, 60, 10, 10,
               80, 10, 10, 60, 10, 10]
    rows = [("click", d, 12, c) for d, c in enumerate(pattern)]
    rows += [("view", d + 2, 12, c) for d, c in enumerate(pattern)]
    _write_events(spark, tmp_path, rows)
    r = stat_dtw_daily(spark, str(tmp_path)).collect()[0]
    assert r["dtw_distance"] <= r["lockstep_l1"]
    assert r["warp_ratio"] < 0.5, r


def test_dtw_identical_series_is_zero(spark, tmp_path):
    from mister_spark.operators.extras245 import stat_dtw_daily

    pattern = [5, 9, 3, 14, 7, 11, 2, 8]
    rows = [("click", d, 12, c) for d, c in enumerate(pattern)]
    rows += [("view", d, 12, c) for d, c in enumerate(pattern)]
    _write_events(spark, tmp_path, rows)
    r = stat_dtw_daily(spark, str(tmp_path)).collect()[0]
    assert r["dtw_distance"] == 0
    assert r["lockstep_l1"] == 0
    assert r["warp_ratio"] == 1.0  # 0/0 guard pins the ratio at 1
    assert r["n_days"] == len(pattern)


def test_circular_hours_spike_vs_uniform(spark, tmp_path):
    from mister_spark.operators.extras245 import stat_circular_hours

    rows = [("signup", d, 9, 10) for d in range(5)]  # all at 09:00
    rows += [("view", d, h, 2) for d in range(5) for h in range(24)]
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in stat_circular_hours(spark, str(tmp_path)).collect()
    }
    spike, flat = out["signup"], out["view"]
    assert spike["resultant"] == 1.0
    assert abs(spike["mean_hour"] - 9.0) < 0.01
    assert spike["rayleigh_p"] < 1e-6
    assert flat["resultant"] < 0.01  # exact uniform clock cancels
    assert flat["rayleigh_p"] > 0.5, flat
