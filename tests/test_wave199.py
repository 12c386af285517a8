"""Wave 199 behavior gates beyond the registry oracle parity.

LOF must rank a locally-sparse point above uniform-cluster members
(and score the cluster near 1); distance correlation must light up on
a V-shaped (zero-Pearson, zero-monotone) dependence and stay near
zero under independence.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

from pyspark.sql import functions as F


def _unit(vals):
    n = math.sqrt(sum(v * v for v in vals))
    return [float(v / n) for v in vals]


def _write_embeddings(spark, tmp_path, vecs):
    rows = [
        (i, [float(x) for x in _unit(v)], 0) for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def _jit(tag, i, j):
    return (hashlib.md5(f"{tag}:{i}:{j}".encode()).digest()[0] - 128) / 4000.0


def test_lof_flags_the_locally_sparse_point(spark, tmp_path):
    from mister_spark.operators.extras199 import ml_lof

    # 20 tightly-packed points around axis e0, one point tilted 30%
    # toward e1 — close enough to share LSH buckets, far enough that
    # its reachability is several times the cluster's internal spacing
    vecs = []
    for i in range(20):
        v = [0.0] * 64
        v[0] = 1.0
        for j in range(1, 8):
            v[j] = _jit("lof", i, j)
        vecs.append(v)
    out = [0.0] * 64
    out[0] = 1.0
    out[1] = 0.55
    vecs.append(out)  # vec_id 20
    _write_embeddings(spark, tmp_path, vecs)
    rows = ml_lof(spark, str(tmp_path)).collect()
    assert rows, "LOF returned nothing"
    top = rows[0]
    assert top["vec_id"] == 20, rows[:3]
    assert top["lof"] > 1.5, top
    # the rest of the board is the uniform cluster: density ratio ~ 1
    others = [r["lof"] for r in rows[1:]]
    assert all(o < top["lof"] for o in others), rows
    assert min(others) < 1.2, rows


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


def test_dcor_sees_v_shape_that_rank_tests_miss(spark, tmp_path):
    from mister_spark.operators.extras199 import stat_distance_correlation

    # purchase = (click - mean)^2 / scale: V-shaped, Pearson ~ 0
    days = []
    for d in range(80):
        c = 10 + _noise("v", d, 80)
        p = 5 + (c - 50) * (c - 50) // 20
        days.append({"click": c, "purchase": p})
    _write_typed_events(spark, tmp_path, days)
    r = stat_distance_correlation(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 80 and r["dcor"] > 0.35, r


def test_dcor_near_zero_under_independence(spark, tmp_path):
    from mister_spark.operators.extras199 import stat_distance_correlation

    days = [
        {
            "click": 10 + _noise("ix", d, 80),
            "purchase": 10 + _noise("iy", d, 80),
        }
        for d in range(120)
    ]
    _write_typed_events(spark, tmp_path, days)
    r = stat_distance_correlation(spark, str(tmp_path)).collect()[0]
    assert r["dcor"] < 0.2, r
