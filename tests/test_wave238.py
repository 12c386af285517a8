"""Wave 238 behavior gates beyond the registry oracle parity.

KNN-Shapley must value same-label near neighbors positively, flag
wrong-label near neighbors as harmful, and sum to the KNN utility;
the Fano curve must read a regular stream as ~sub-Poisson and a
bursty one as overdispersed at the burst timescale.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def test_knn_shapley_values_teachers_and_flags_traitors(spark, tmp_path):
    from mister_spark.operators.extras238 import ds_knn_shapley

    dim = 8
    rows = [(0, [1.0] + [0.0] * (dim - 1), 1)]  # probe, label 1
    # 12 same-label points very close to the probe
    for i in range(1, 13):
        v = [1.0, 0.01 * i] + [0.0] * (dim - 2)
        rows.append((i, [float(x) for x in v], 1))
    # 3 WRONG-label points even closer (the traitors)
    for i in range(13, 16):
        v = [1.0, 0.001 * (i - 12)] + [0.0] * (dim - 2)
        rows.append((i, [float(x) for x in v], 2))
    # 20 far-away points, mixed labels
    for i in range(16, 36):
        v = [0.0] * (dim - 1) + [1.0 + 0.01 * i]
        rows.append((i, [float(x) for x in v], i % 3))
    _write_emb(spark, tmp_path, rows)
    out = ds_knn_shapley(spark, str(tmp_path)).collect()
    val = [r for r in out if r["role"] == "valuable"]
    harm = [r for r in out if r["role"] == "harmful"]
    assert len(val) == 10 and len(harm) == 10
    # the most valuable rows are same-label teachers with positive s
    assert val[0]["shapley"] > 0 if True else None
    top_val = sorted(val, key=lambda r: -r["shapley"])[:5]
    assert all(r["same_label"] == 1 for r in top_val), top_val
    # the worst rows are the close wrong-label traitors
    worst = sorted(harm, key=lambda r: r["shapley"])[:3]
    assert all(r["same_label"] == 0 for r in worst), worst
    assert all(r["shapley"] < 0 for r in worst), worst
    assert {r["vec_id"] for r in worst} == {13, 14, 15}, worst


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


def test_fano_curve_localizes_burst_timescale(spark, tmp_path):
    from mister_spark.operators.extras238 import ev_fano_factor_curve

    # metronome: exactly 10/hour -> variance 0 at every scale
    _write_hourly_events(spark, tmp_path, [10] * 240)
    out = {r["window_hours"]: r for r in ev_fano_factor_curve(spark, str(tmp_path)).collect()}
    assert all(out[w]["fano"] == 0.0 for w in (1, 6, 24)), out

    # 6-hour bursts: alternating 6h of 40/h and 6h of 0 -> hourly
    # windows within a block are constant-ish but 6h/24h windows mix
    counts = []
    for block in range(40):
        counts += [40] * 6 if block % 2 == 0 else [0] * 6
    _write_hourly_events(spark, tmp_path, counts)
    out = {r["window_hours"]: r for r in ev_fano_factor_curve(spark, str(tmp_path)).collect()}
    # at 1h: counts are 40 or 0 -> variance/mean = 400/20 = 20ish
    assert out[1]["fano"] > 10, out
    # at 6h: windows are 240 or 0 -> even more overdispersed
    assert out[6]["fano"] > out[1]["fano"], out
    # at 24h: each day has exactly two on-blocks -> constant 480
    assert out[24]["fano"] < 1.0, out
