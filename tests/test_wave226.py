"""Wave 226 behavior gates beyond the registry oracle parity.

SIR must spread fully on a connected hub graph and stay contained on
the seed's component when the graph is split; confident learning
must recover a planted label-flip rate and read clean labels as
~zero error.
"""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F


def _write_trade(spark, tmp_path, edges, copies=2):
    sup, cus, orders, li = [], [], [], []
    sup_of, cus_of = {}, {}
    oid = 0
    for s, d in edges:
        if s not in sup_of:
            sup_of[s] = len(sup_of) + 1
            sup.append((sup_of[s], s))
        if d not in cus_of:
            cus_of[d] = len(cus_of) + 1
            cus.append((cus_of[d], d))
        for _ in range(copies):
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


def test_sir_spread_respects_topology(spark, tmp_path):
    from mister_spark.operators.extras226 import graph_sir_contagion

    # hub 0 connected to 8 spokes: full epidemic from the hub
    _write_trade(spark, tmp_path, [(0, k) for k in range(1, 9)])
    out = sorted(
        graph_sir_contagion(spark, str(tmp_path)).collect(),
        key=lambda r: r["step"],
    )
    assert len(out) == 21
    assert out[0]["i_share"] > 0.05, out[0]
    assert out[0]["final_attack_rate"] > 0.7, out[0]
    # infection rises then falls: the peak is an interior step
    assert 0 < out[0]["peak_step"] < 20, out[0]
    # r_share is monotone non-decreasing
    rs = [r["r_share"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(rs, rs[1:])), rs

    # split graph: seed's component = {0..8}, isolated pair {20, 21}
    # never catches it
    _write_trade(
        spark, tmp_path, [(0, k) for k in range(1, 9)] + [(20, 21)]
    )
    out = sorted(
        graph_sir_contagion(spark, str(tmp_path)).collect(),
        key=lambda r: r["step"],
    )
    # 2 of 11 nodes stay fully susceptible: attack rate caps at 9/11
    assert out[0]["final_attack_rate"] < 9 / 11 + 0.01, out[0]


def _write_emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def test_confident_learning_recovers_planted_flip_rate(spark, tmp_path):
    from mister_spark.operators.extras226 import ds_confident_learning

    def logit(p):
        return -math.log(1 / p - 1)

    # clean: confident scores agree with labels everywhere
    rows = []
    for i in range(2000):
        pos = i % 2 == 0
        x = logit(0.95 if pos else 0.05)
        rows.append((i, [float(x)] + [0.0] * 7, 0 if pos else 9))
    _write_emb(spark, tmp_path, rows)
    r = ds_confident_learning(spark, str(tmp_path)).collect()[0]
    assert r["est_label_error_rate"] == 0.0, r

    # plant ~8% label flips on the same confident scores
    rows = []
    flips = 0
    for i in range(2000):
        pos = i % 2 == 0
        x = logit(0.95 if pos else 0.05)
        y = pos
        h = int(hashlib.md5(f"fl:{i}".encode()).hexdigest()[:4], 16)
        if h % 100 < 8:
            y = not y
            flips += 1
        rows.append((i, [float(x)] + [0.0] * 7, 0 if y else 9))
    _write_emb(spark, tmp_path, rows)
    r = ds_confident_learning(spark, str(tmp_path)).collect()[0]
    planted = flips / 2000
    assert abs(r["est_label_error_rate"] - planted) < 0.03, (r, planted)
    assert r["flagged_neg_labeled_pos_scored"] > 0, r
    assert r["flagged_pos_labeled_neg_scored"] > 0, r
