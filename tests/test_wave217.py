"""Wave 217 behavior gates beyond the registry oracle parity.

The hinge trend must read a planted bend through a weekly sawtooth
(and report no bend on a straight line); greedy facility location
must spread its first picks across planted clusters with
non-increasing marginal gains.
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
            rows.append((eid, f"{d} 10:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_hinge_trend_reads_bend_through_sawtooth(spark, tmp_path):
    from mister_spark.operators.extras217 import ev_piecewise_trend

    saw = [0, 6, 2, 8, 4, 10, 1]  # weekly cycle, range 10
    # flat 30 for 28 days, then +3/day, sawtooth overlaid throughout
    counts = [30 + saw[i % 7] for i in range(28)] + [
        30 + 3 * i + saw[(28 + i) % 7] for i in range(1, 29)
    ]
    _write_daily_events(spark, tmp_path, counts)
    r = ev_piecewise_trend(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 56, r
    assert abs(r["slope_before"]) < 0.4, r
    assert r["slope_after"] > 2.3, r
    assert r["hinge_gain"] > 0.5, r
    assert r["weekday_range"] > 5, r

    # straight line + sawtooth: the hinge buys ~nothing
    counts = [30 + 2 * i + saw[i % 7] for i in range(56)]
    _write_daily_events(spark, tmp_path, counts)
    r = ev_piecewise_trend(spark, str(tmp_path)).collect()[0]
    assert abs(r["slope_change"]) < 0.2, r
    assert r["hinge_gain"] < 0.2, r
    assert abs(r["slope_before"] - 2) < 0.2, r


def test_facility_location_spreads_across_clusters(spark, tmp_path):
    from mister_spark.operators.extras217 import ds_facility_location

    dim, per = 8, 30
    diag = 1.0 / math.sqrt(3)
    rows = []
    for k in range(3):
        for i in range(per):
            v = [0.0] * dim
            v[k] = 1.0
            w = 0.01 * (i + 1)
            for ax in range(3):
                v[ax] += w * diag
            rows.append((k * 100 + i, [float(x) for x in v], k))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    out = ds_facility_location(spark, str(tmp_path)).collect()
    assert [r["sel_round"] for r in out] == [1, 2, 3, 4, 5, 6]
    # the first three facilities cover the three planted clusters
    assert {r["vec_id"] // 100 for r in out[:3]} == {0, 1, 2}, out[:3]
    gains = [r["marginal_gain"] for r in out]
    assert all(a >= b - 1e-9 for a, b in zip(gains, gains[1:])), gains
    covs = [r["total_coverage"] for r in out]
    assert all(b >= a for a, b in zip(covs, covs[1:])), covs
