"""Wave 239 behavior gates beyond the registry oracle parity.

The ZTP fit must recover a planted lambda and its silent-user count
from truncated data; trophic levels must read a planted chain as a
staircase (F0 ~ 0) and a cycle as maximally incoherent.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_user_event_counts(spark, tmp_path, user_counts):
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    for uid, k in user_counts:
        for j in range(k):
            ts = (d0 + datetime.timedelta(minutes=j)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts, uid))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_ztp_recovers_planted_lambda(spark, tmp_path):
    from mister_spark.operators.extras239 import stat_zero_truncated_poisson

    # plant lambda = 2 via a deterministic Poisson-like profile:
    # counts k with multiplicities ~ Poisson(2) pmf on 1000 users,
    # zeros REMOVED (the truncation the op must undo)
    lam = 2.0
    total = 1000
    user_counts = []
    uid = 0
    for k in range(1, 9):
        pk = math.exp(-lam) * lam**k / math.factorial(k)
        n_k = round(total * pk)
        for _ in range(n_k):
            user_counts.append((uid, k))
            uid += 1
    _write_user_event_counts(spark, tmp_path, user_counts)
    r = stat_zero_truncated_poisson(spark, str(tmp_path)).collect()[0]
    assert abs(r["lambda"] - lam) < 0.05, r
    assert abs(r["implied_zero_share"] - math.exp(-lam)) < 0.01, r
    # implied totals ~ the 1000 including the removed zero class
    assert abs(r["implied_total_population"] - total) < 40, r
    assert r["implied_silent_users"] > 100, r


def _write_trade(spark, tmp_path, edges):
    """edges: (src, dst, copies)."""
    sup, cus, orders, li = [], [], [], []
    sup_of, cus_of = {}, {}
    oid = 0
    for s, d, w in edges:
        if s not in sup_of:
            sup_of[s] = len(sup_of) + 1
            sup.append((sup_of[s], s))
        if d not in cus_of:
            cus_of[d] = len(cus_of) + 1
            cus.append((cus_of[d], d))
        for _ in range(w):
            oid += 1
            orders.append((oid, cus_of[d]))
            li.append((oid, sup_of[s]))
    base = str(tmp_path)
    spark.createDataFrame(sup, "s_suppkey long, s_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(li, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "lineitem.parquet"))
    spark.createDataFrame(
        [(z, f"NATION_{z}") for z in sorted(set(sup_of) | set(cus_of))],
        "n_nationkey long, n_name string",
    ).write.mode("overwrite").parquet(os.path.join(base, "nation.parquet"))


def test_trophic_levels_read_chain_vs_cycle(spark, tmp_path):
    from mister_spark.operators.extras239 import graph_trophic_levels

    # chain 0 -> 1 -> 2 -> 3: a perfect staircase, F0 = 0
    _write_trade(spark, tmp_path, [(0, 1, 3), (1, 2, 3), (2, 3, 3)])
    out = {r["nation"]: r for r in graph_trophic_levels(spark, str(tmp_path)).collect()}
    assert out["NATION_0"]["incoherence"] < 0.01, out
    levels = [out[f"NATION_{z}"]["trophic_level"] for z in range(4)]
    assert levels[0] < levels[1] < levels[2] < levels[3], levels
    assert abs(levels[3] - levels[0] - 3) < 0.05, levels

    # 3-cycle: no hierarchy exists, F0 near 1, levels ~equal
    _write_trade(spark, tmp_path, [(0, 1, 3), (1, 2, 3), (2, 0, 3)])
    out = {r["nation"]: r for r in graph_trophic_levels(spark, str(tmp_path)).collect()}
    assert out["NATION_0"]["incoherence"] > 0.6, out
    lv = [out[f"NATION_{z}"]["trophic_level"] for z in range(3)]
    assert max(lv) - min(lv) < 0.2, lv
