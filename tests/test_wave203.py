"""Wave 203 behavior gates beyond the registry oracle parity.

RANSAC must recover an exactly-planted line under 10% gross
contamination (where the consensus excludes every outlier); spectral
coherence must read near 1 on a shared phase-shifted cycle and lower
on independent noise.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

from pyspark.sql import functions as F


def test_ransac_recovers_planted_line_under_contamination(spark, tmp_path):
    from mister_spark.operators.extras203 import stat_ransac

    # 90 clean rows on y = 100 + 10x, 10 gross outliers at y = 5000
    rows = []
    for i in range(90):
        x = 1 + i % 30
        rows.append((i, 1, float(x), 100.0 + 10.0 * x))
    for i in range(90, 100):
        rows.append((i, 1, float(1 + i % 30), 5000.0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    r = stat_ransac(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 100, r
    assert r["consensus_size"] == 90 and r["inlier_share"] == 0.9, r
    assert r["refit_slope"] == 10.0, r
    assert r["refit_intercept"] == 100.0, r


def _write_typed_events(spark, tmp_path, day_type_counts):
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


def _noise(tag, d, span):
    return hashlib.md5(f"{tag}:{d}".encode()).digest()[0] % span


def test_coherence_sees_shared_cycle_through_phase_shift(spark, tmp_path):
    from mister_spark.operators.extras203 import stat_spectral_coherence

    # shared 12-day cycle, purchases lag clicks by 3 days (quarter
    # cycle, so time-domain same-day correlation is ~0); n=96 days
    # puts the cycle at harmonic k = 8
    days = []
    for d in range(96):
        c = 60 + round(30 * math.sin(2 * math.pi * d / 12))
        p = 60 + round(30 * math.sin(2 * math.pi * (d - 3) / 12))
        days.append({"click": c + _noise("cc", d, 5),
                     "purchase": p + _noise("cp", d, 5)})
    _write_typed_events(spark, tmp_path, days)
    rows = {
        r["freq_k"]: r
        for r in stat_spectral_coherence(spark, str(tmp_path)).collect()
    }
    assert abs(rows[8]["period_days"] - 12.0) < 0.01, rows[8]
    cycle_coh = rows[8]["coherence"]
    assert cycle_coh > 0.85, rows[8]

    # independent noise: the k=8 band loses its coherence
    days = [
        {
            "click": 40 + _noise("ix", d, 60),
            "purchase": 40 + _noise("iy", d, 60),
        }
        for d in range(96)
    ]
    _write_typed_events(spark, tmp_path, days)
    rows = {
        r["freq_k"]: r
        for r in stat_spectral_coherence(spark, str(tmp_path)).collect()
    }
    assert rows[8]["coherence"] < cycle_coh - 0.25, (cycle_coh, rows[8])
