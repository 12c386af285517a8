"""Wave 218 behavior gates beyond the registry oracle parity.

BOCPD must spike p_change at a planted level shift (and keep growing
its MAP run on a stable series); the reflection backlog must
reproduce a hand-computed burst scenario exactly.
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
            rows.append((eid, f"{d} 11:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_bocpd_spikes_at_planted_shift(spark, tmp_path):
    from mister_spark.operators.extras218 import ev_bocpd

    # 20 quiet days at ~12, then 20 loud days at ~60
    counts = [12 + (i % 3) for i in range(20)] + [
        60 + (i % 3) for i in range(20)
    ]
    _write_daily_events(spark, tmp_path, counts)
    out = ev_bocpd(spark, str(tmp_path)).collect()
    assert len(out) == 40
    by_day = {r["day"]: r for r in out}
    shift = by_day["2024-01-21"]  # first loud day
    assert shift["p_change"] > 0.5, shift
    assert shift["map_run"] == 1, shift
    # the day before: long run, low change belief
    before = by_day["2024-01-20"]
    assert before["p_change"] < 0.2, before
    assert before["map_run"] > 10, before
    # well after the shift the run has regrown
    assert by_day["2024-02-09"]["map_run"] > 10, by_day["2024-02-09"]

    # stable series: MAP run just keeps growing, no spike after day 1
    _write_daily_events(spark, tmp_path, [30 + (i % 3) for i in range(30)])
    out = ev_bocpd(spark, str(tmp_path)).collect()
    assert max(r["p_change"] for r in out[2:]) < 0.3, out
    assert out[-1]["map_run"] >= 25, out[-1]


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


def test_backlog_reflection_matches_hand_computation(spark, tmp_path):
    from mister_spark.operators.extras218 import ev_backlog_reflection

    # 20 hours: mostly 4/hour, one 3-hour burst of 14 at hours 5-7,
    # one empty hour at 15. total = 4*16 + 14*3 + 0 = 106,
    # capacity = ceil(1.1 * 106/20) = ceil(5.83) = 6
    counts = [4] * 20
    counts[5] = counts[6] = counts[7] = 14
    counts[15] = 0
    _write_hourly_events(spark, tmp_path, counts)
    r = ev_backlog_reflection(spark, str(tmp_path)).collect()[0]
    assert r["n_hours"] == 20 and r["capacity"] == 6, r
    # burst: +8 per hour for 3 hours -> peak 24 at hour 7, draining
    # 2/hour afterwards (8 hours to empty at hour 19... check drain)
    assert r["peak_backlog"] == 24, r
    assert r["peak_hour"] == "2024-01-01 07:00", r
    # backlog hours: 5..18 inclusive = 14 of 20 (drains 24/2=12 hours
    # after hour 7, with the empty hour 15 draining 6)
    assert r["busy_periods"] == 1, r
    assert 0.5 < r["pct_hours_backlogged"] < 0.9, r
    assert abs(r["utilization"] - 106 / 120) < 1e-3, r
