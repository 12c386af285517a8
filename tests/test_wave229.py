"""Wave 229 behavior gates beyond the registry oracle parity.

The MCF must match a hand-computed staggered-entry scenario and stay
flat for users who never recur; the betting martingale must detect a
planted run of ups quickly and stay honest (wealth ~<= 1-ish) on
alternating directions.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, user_days):
    """user_days: list of (user_id, [day indexes])."""
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for uid, ds in user_days:
        for day in ds:
            d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
            rows.append((eid, f"{d} 12:00:00", uid))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_mcf_matches_staggered_entry_hand_computation(spark, tmp_path):
    from mister_spark.operators.extras229 import ev_mean_cumulative_function

    # u1 enters day0, recurs day2, day4; u2 enters day2, recurs day4;
    # u3 enters day4, never recurs
    _write_events(
        spark, tmp_path, [(1, [0, 2, 4]), (2, [2, 4]), (3, [4])]
    )
    out = {r["day"]: r for r in ev_mean_cumulative_function(spark, str(tmp_path)).collect()}
    # day0: 1 at risk, 0 recurrences
    assert out["2024-01-01"]["at_risk"] == 1
    assert out["2024-01-01"]["mcf"] == 0.0
    # day2: 2 at risk, u1 recurs -> +1/2
    assert out["2024-01-03"]["at_risk"] == 2
    assert out["2024-01-03"]["mcf"] == 0.5
    # day4: 3 at risk, u1+u2 recur -> +2/3 -> 0.5 + 0.6667
    assert out["2024-01-05"]["at_risk"] == 3
    assert out["2024-01-05"]["events"] == 2
    assert abs(out["2024-01-05"]["mcf"] - (0.5 + 2 / 3)) < 1e-3


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 06:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_betting_martingale_detects_runs_not_alternation(spark, tmp_path):
    from mister_spark.operators.extras229 import stat_betting_martingale

    # strictly increasing: every day "up" -> wealth 1.5^n explodes;
    # detection needs 1.5^k >= 20 -> k = 8 bets -> day 9
    _write_daily_events(spark, tmp_path, [10 + 2 * i for i in range(20)])
    r = stat_betting_martingale(spark, str(tmp_path)).collect()[0]
    assert r["detected"] == 1, r
    assert r["detection_day"] == "2024-01-09", r
    assert r["peak_wealth"] > 100, r

    # perfect alternation: each book wins half, loses half ->
    # wealth (1.5*0.5)^k shrinks; never detected
    _write_daily_events(
        spark, tmp_path, [20 + (5 if i % 2 == 0 else -5) for i in range(30)]
    )
    r = stat_betting_martingale(spark, str(tmp_path)).collect()[0]
    assert r["detected"] == 0 and r["detection_day"] == "never", r
    assert r["peak_wealth"] <= 1.5, r
