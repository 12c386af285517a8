"""Wave 205 behavior gates beyond the registry oracle parity.

Sinkhorn OT must read near zero between identically-distributed
label groups and clearly positive under a planted cluster shift
(with a converged plan); the E-value must hit the textbook
2 + sqrt(2) at RR=2 and collapse to 1 under the null.
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


def _jit(tag, i, j):
    return (hashlib.md5(f"{tag}:{i}:{j}".encode()).digest()[0] - 128) / 2000.0


def _write_embeddings(spark, tmp_path, vecs_labels):
    rows = [
        (i, _unit(v), int(lb)) for i, (v, lb) in enumerate(vecs_labels)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def _cluster_vec(tag, i, axis):
    v = [0.0] * 64
    v[axis] = 1.0
    for j in range(8, 16):
        v[j] = _jit(tag, i, j)
    return v


def test_sinkhorn_ot_prices_a_cluster_shift(spark, tmp_path):
    from mister_spark.operators.extras205 import ml_sinkhorn_ot

    # same distribution on both labels: transport is near free
    same = [
        (_cluster_vec("s", i, 0), i % 2) for i in range(80)
    ]
    _write_embeddings(spark, tmp_path, same)
    r0 = ml_sinkhorn_ot(spark, str(tmp_path)).collect()[0]
    assert r0["marginal_err"] < 0.05, r0

    # label 1 moved to an orthogonal axis: cost ~ |e0 - e1|^2 ~ 2
    shifted = [
        (_cluster_vec("t", i, 0 if i % 2 == 0 else 1), i % 2)
        for i in range(80)
    ]
    _write_embeddings(spark, tmp_path, shifted)
    r1 = ml_sinkhorn_ot(spark, str(tmp_path)).collect()[0]
    assert r1["marginal_err"] < 0.05, r1
    assert r1["ot_cost"] > r0["ot_cost"] + 1.0, (r0, r1)
    assert r1["ot_cost"] > 1.5, r1


def _write_user_events(spark, tmp_path, user_days):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for uid, evs in user_days:
        for day, etype in evs:
            ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
            rows.append((eid, ts, uid, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long,"
            " event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_evalue_reads_textbook_value_at_rr2(spark, tmp_path):
    from mister_spark.operators.extras205 import stat_evalue

    # engaged: 40 users, 20 buy (50%); unengaged: 40 users, 10 buy
    # (25%) -> RR = 2, E-value = 2 + sqrt(2) = 3.4142
    users = []
    for i in range(40):
        evs = [(0, "click"), (0, "view")]
        if i < 20:
            evs.append((3, "purchase"))
        users.append((i, evs))
    for i in range(40, 80):
        evs = [(0, "click")]
        if i < 50:
            evs.append((3, "purchase"))
        users.append((i, evs))
    _write_user_events(spark, tmp_path, users)
    r = stat_evalue(spark, str(tmp_path)).collect()[0]
    assert r["n_engaged"] == 40 and r["n_unengaged"] == 40, r
    assert r["risk_ratio"] == 2.0, r
    assert abs(r["evalue_point"] - 3.4142) < 1e-3, r
    assert r["evalue_ci"] >= 1.0, r


def test_evalue_collapses_to_one_under_the_null(spark, tmp_path):
    from mister_spark.operators.extras205 import stat_evalue

    users = []
    for i in range(80):
        evs = [(0, "click")] + ([(0, "view")] if i % 2 == 0 else [])
        if i % 4 < 2:  # same 50% purchase rate in both arms
            evs.append((2, "purchase"))
        users.append((i, evs))
    _write_user_events(spark, tmp_path, users)
    r = stat_evalue(spark, str(tmp_path)).collect()[0]
    assert r["risk_ratio"] == 1.0, r
    assert r["evalue_point"] == 1.0 and r["evalue_ci"] == 1.0, r
