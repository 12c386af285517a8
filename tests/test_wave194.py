"""Wave 194 behavior gates beyond the registry oracle parity.

VIF must read ~1 on orthogonal features and blow up on a planted
near-duplicate pair; the matrix profile must find a planted repeated
week as the motif and a planted one-off shape as the discord.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_li(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_vif_reads_collinearity(spark, tmp_path):
    from mister_spark.operators.extras194 import ml_vif

    # near-orthogonal features (4-level full factorial): VIF ~ 1
    rows = [
        (float(q), float(p), float(d) / 10, float(t) / 10)
        for q in range(4)
        for p in range(4)
        for d in range(4)
        for t in range(4)
    ]
    _write_li(spark, tmp_path, rows)
    got = {x["feature"]: x for x in ml_vif(spark, str(tmp_path)).collect()}
    assert all(abs(got[f]["vif"] - 1.0) < 0.05 for f in got), got

    # plant price ~ 100*quantity + tiny wobble: both VIFs explode
    import hashlib

    rows = []
    for i in range(200):
        q = float(i % 37)
        eps = hashlib.md5(f"v:{i}".encode()).digest()[0] / 255.0
        rows.append((q, 100.0 * q + eps, float(i % 5) / 10, float(i % 3) / 10))
    _write_li(spark, tmp_path, rows)
    got = {x["feature"]: x for x in ml_vif(spark, str(tmp_path)).collect()}
    assert got["quantity"]["vif"] > 50, got
    assert got["extendedprice"]["vif"] > 50, got
    assert got["discount"]["vif"] < 5, got


def _write_daily_events(spark, tmp_path, per_day):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_matrix_profile_finds_motif_and_discord(spark, tmp_path):
    from mister_spark.operators.extras194 import ev_matrix_profile

    # a strongly periodic weekly base (so same-phase windows match
    # each other — pure flat noise would z-normalize into random
    # shapes and steal the discord); two identical planted weeks
    # (days 14-20 and 70-76, spaced so every phase keeps clean
    # partners) are the motif; one wild week (days 42-48) matches
    # nothing and owns the discord region
    import hashlib

    shape = [100, 104, 112, 124, 118, 108, 102]

    def noise(d, a=2):
        return hashlib.md5(f"mp:{d}".encode()).digest()[0] % a

    days = [shape[d % 7] + noise(d) for d in range(98)]
    planted = [150, 90, 160, 80, 170, 100, 140]
    for k in range(7):
        days[14 + k] = planted[k]
        days[70 + k] = planted[k]
    wild = [100, 170, 30, 180, 20, 160, 40]
    for k in range(7):
        days[42 + k] = wild[k]
    _write_daily_events(spark, tmp_path, days)
    base = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    r = ev_matrix_profile(spark, str(tmp_path)).collect()[0]
    assert r["n_windows"] == 92, r
    assert (r["motif_start_1"], r["motif_start_2"]) == (
        base + 14,
        base + 70,
    ), r
    assert r["motif_dist"] == 0.0, r
    # the discord window overlaps the wild week
    assert base + 36 <= r["discord_start"] <= base + 48, r
    assert r["discord_dist"] > 1.0, r
