"""Wave 208 behavior gates beyond the registry oracle parity.

The C-index must read ~1 when the risk factor perfectly orders
conversions and ~0.5 under a null factor; circular correlation must
read +1 on phase-locked clocks THROUGH the midnight wrap (where raw
Pearson on hour numbers breaks) and ~0 on unrelated clocks.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_user_events(spark, tmp_path, user_days):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for uid, evs in user_days:
        for day, hour, etype in evs:
            ts = f"{d0 + datetime.timedelta(days=day)} {hour:02d}:00:00"
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


def test_cindex_reads_perfect_and_null_ordering(spark, tmp_path):
    from mister_spark.operators.extras208 import ml_survival_cindex

    # engaged users (2 events day 0) convert days 1-3, unengaged
    # days 5-8: engagement perfectly orders every usable cross pair
    users = []
    for i in range(40):
        if i % 2 == 0:
            users.append(
                (i, [(0, 9, "click"), (0, 10, "view"),
                     (1 + i % 3, 12, "purchase")])
            )
        else:
            users.append((i, [(0, 9, "click"), (5 + i % 4, 12, "purchase")]))
    _write_user_events(spark, tmp_path, users)
    r = ml_survival_cindex(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 40 and r["n_events"] == 40, r
    # cross-group pairs are all concordant; same-group ties get 0.5
    assert r["c_index"] > 0.75, r

    # null: factor assigned independently of the conversion delay
    users = []
    for i in range(60):
        delay = 1 + hashlib.md5(f"cidx:{i}".encode()).digest()[0] % 8
        evs = [(0, 9, "click")]
        if i % 2 == 0:
            evs.append((0, 10, "view"))
        evs.append((delay, 12, "purchase"))
        users.append((i, evs))
    _write_user_events(spark, tmp_path, users)
    r = ml_survival_cindex(spark, str(tmp_path)).collect()[0]
    # 60 users over 8 delay values: the null C-index has real
    # finite-sample spread; the gate separates it from the ~0.8
    # perfect-ordering case above, not from exactly 0.5
    assert abs(r["c_index"] - 0.5) < 0.12, r


def test_circular_corr_sees_phase_lock_through_midnight(spark, tmp_path):
    from mister_spark.operators.extras208 import stat_circular_corr

    # night-owl users: click hours cluster 22:00-03:00 (wrapping
    # midnight — the case raw-hour Pearson butchers), purchases
    # exactly 2h later mod 24: phase-locked clocks, r -> +1.
    # (Hours must be CONCENTRATED: with uniform marginals the
    # circular mean degenerates and a pure rotation reads cos(delta).)
    users = []
    for i in range(48):
        h = (22 + i % 6) % 24
        users.append(
            (i, [(0, h, "click"), (1, (h + 2) % 24, "purchase")])
        )
    _write_user_events(spark, tmp_path, users)
    r = stat_circular_corr(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 48 and r["circ_corr"] > 0.95, r

    # unrelated clocks: hash-independent hours
    users = []
    for i in range(80):
        hc = hashlib.md5(f"cc:{i}".encode()).digest()[0] % 24
        hp = hashlib.md5(f"cp:{i}".encode()).digest()[0] % 24
        users.append((i, [(0, hc, "click"), (1, hp, "purchase")]))
    _write_user_events(spark, tmp_path, users)
    r = stat_circular_corr(spark, str(tmp_path)).collect()[0]
    assert abs(r["circ_corr"]) < 0.25, r
