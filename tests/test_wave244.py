"""Wave 244 behavior gates beyond the registry oracle parity.

The Kalman filter must track a replicated reference recursion exactly,
hold a constant series at the constant with the gain at its steady
state, and converge toward a level shift. The Granger test must call
the planted lead direction (clicks lead views by one day) and stay
quiet in the reverse direction.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, day_counts):
    """day_counts: {event_type: [count per day d=0..]}."""
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for etype, counts in day_counts.items():
        for day, c in enumerate(counts):
            d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
            for _ in range(c):
                rows.append((eid, f"{d} 12:00:00", etype))
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


def _kalman_ref(ys, q, r):
    """Pure-python replica of the recursion, same 1e-6 rounding."""
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    lvl, p, out = float(ys[0]), r, [(float(ys[0]), r, 0.0)]
    for y in ys[1:]:
        k = (p + q) / (p + q + r)
        lvl = g6(lvl + k * (y - lvl))
        p = g6((1 - k) * (p + q))
        out.append((lvl, p, g6(k)))
    return out


def test_kalman_matches_reference_and_steady_state(spark, tmp_path):
    from mister_spark.operators.extras244 import KL_Q, KL_R, ev_kalman_level

    ys = [100, 140, 90, 130, 80, 120, 110, 105, 95, 115] + [100] * 20
    _write_events(spark, tmp_path, {"click": ys})
    rows = sorted(
        ev_kalman_level(spark, str(tmp_path)).collect(),
        key=lambda row: row["day"],
    )
    assert len(rows) == len(ys)
    ref = _kalman_ref(ys, KL_Q, KL_R)
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    for row, (lvl, p, k), y in zip(rows, ref, ys):
        assert row["n_events"] == y
        assert row["level"] == g4(lvl), (row, lvl)
        assert row["variance"] == g4(p)
        assert row["kalman_gain"] == g4(k)
    # steady-state gain: K* = (P*+Q)/(P*+Q+R), P* = (-Q+sqrt(Q^2+4QR))/2
    p_star = (-KL_Q + math.sqrt(KL_Q * KL_Q + 4 * KL_Q * KL_R)) / 2
    k_star = (p_star + KL_Q) / (p_star + KL_Q + KL_R)
    assert abs(rows[-1]["kalman_gain"] - k_star) < 1e-3
    # a long constant tail pins the level to the constant
    assert abs(rows[-1]["level"] - 100) < 0.5


def test_kalman_tracks_level_shift(spark, tmp_path):
    from mister_spark.operators.extras244 import ev_kalman_level

    ys = [50] * 10 + [200] * 10
    _write_events(spark, tmp_path, {"view": ys})
    rows = sorted(
        ev_kalman_level(spark, str(tmp_path)).collect(),
        key=lambda row: row["day"],
    )
    assert rows[9]["level"] == 50  # settled pre-shift
    assert rows[10]["level"] > 50 + 30  # reacts on the shift day
    assert abs(rows[-1]["level"] - 200) < 15  # mostly converged


def test_granger_calls_the_planted_lead(spark, tmp_path):
    from mister_spark.operators.extras244 import stat_granger_causality

    # clicks follow a varied pattern; views = yesterday's clicks plus a
    # small wobble (so the unrestricted RSS is nonzero)
    clicks = [20, 50, 30, 70, 40, 90, 25, 60, 35, 80, 45, 55, 65, 30, 75,
              40, 85, 20, 50, 95, 30, 60, 45, 70, 25, 80, 55, 35, 90, 40]
    views = [30] + [c + (i % 3) for i, c in enumerate(clicks[:-1])]
    _write_events(spark, tmp_path, {"click": clicks, "view": views})
    out = {
        r["direction"]: r
        for r in stat_granger_causality(spark, str(tmp_path)).collect()
    }
    lead = out["click->view"]
    echo = out["view->click"]
    assert lead["n_obs"] == 29
    assert lead["p_value"] < 0.001, lead
    assert lead["f_stat"] > 20, lead
    assert abs(lead["beta_other"] - 1.0) < 0.1, lead
    assert echo["p_value"] > 0.05, echo
