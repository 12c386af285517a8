"""Wave 207 behavior gates beyond the registry oracle parity.

WL refinement must resolve structurally distinct roles (path ends vs
middles), keep isomorphic graphs' fingerprints equal and separate
non-isomorphic ones; Lomb-Scargle must find a planted 7-day cycle
through 40% missing days — the case where a present-day-index
periodogram aliases.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

from pyspark.sql import functions as F


def _write_basket_graph(spark, tmp_path, edges, reps=3):
    """Write lineitem so _copurchase_edges yields exactly `edges`
    (each co-purchase pair repeated in `reps` orders >= support)."""
    rows, ok = [], 0
    for p1, p2 in edges:
        for _ in range(reps):
            rows.append((ok, p1))
            rows.append((ok, p2))
            ok += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_wl_resolves_roles_and_fingerprints_isomorphism(spark, tmp_path):
    from mister_spark.operators.extras207 import graph_wl_refinement

    # path graph 1-2-3-4-5: degrees {1,2}, then WL splits ends,
    # their neighbors, and the middle: classes grow 2 -> 3
    _write_basket_graph(
        spark, tmp_path, [(1, 2), (2, 3), (3, 4), (4, 5)]
    )
    rows = {r["round"]: r for r in
            graph_wl_refinement(spark, str(tmp_path)).collect()}
    assert rows[0]["n_classes"] == 2, rows
    assert rows[3]["n_classes"] == 3, rows
    path_hash = rows[3]["graph_hash"]

    # same path with relabeled nodes: identical fingerprint
    _write_basket_graph(
        spark, tmp_path, [(10, 90), (90, 30), (30, 70), (70, 50)]
    )
    rows2 = {r["round"]: r for r in
             graph_wl_refinement(spark, str(tmp_path)).collect()}
    assert rows2[3]["graph_hash"] == path_hash, (rows, rows2)

    # 5-cycle: vertex-transitive, one class forever — and a
    # different fingerprint from the path
    _write_basket_graph(
        spark, tmp_path, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    )
    rows3 = {r["round"]: r for r in
             graph_wl_refinement(spark, str(tmp_path)).collect()}
    assert rows3[3]["n_classes"] == 1, rows3
    assert rows3[3]["graph_hash"] != path_hash, rows3


def _write_daily_events_gappy(spark, tmp_path, per_day):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        if n is None:
            continue  # missing day
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


def test_lomb_scargle_finds_cycle_through_gaps(spark, tmp_path):
    from mister_spark.operators.extras207 import ev_lomb_scargle

    per_day = []
    for d in range(112):
        if hashlib.md5(f"gap:{d}".encode()).digest()[0] < 102:  # ~40%
            per_day.append(None)
        else:
            per_day.append(
                60 + round(30 * math.sin(2 * math.pi * d / 7))
            )
    _write_daily_events_gappy(spark, tmp_path, per_day)
    rows = {r["period_days"]: r["ls_power"]
            for r in ev_lomb_scargle(spark, str(tmp_path)).collect()}
    others = [v for p, v in rows.items() if p != 7]
    assert rows[7] > 3 * max(others), rows
