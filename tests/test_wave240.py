"""Wave 240 behavior gates beyond the registry oracle parity.

Mixing time must read a near-deterministic cycle as slow-mixing and
an iid chain as instant; von Neumann entropy must rank a star below
a complete graph with the right connectivity values.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_user_events(spark, tmp_path, transitions):
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    for uid, seq in transitions:
        for k2, etype in enumerate(seq):
            ts = (d0 + datetime.timedelta(minutes=k2)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts, uid, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string",
        )
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_mixing_time_separates_cycle_from_iid(spark, tmp_path):
    from mister_spark.operators.extras240 import ev_markov_mixing_time

    # iid-ish: every state jumps uniformly to all three -> SLEM ~ 0
    seqs = []
    pattern = ["a", "b", "c"]
    for u in range(60):
        seq = [pattern[(u + i * (1 + u % 3)) % 3] for i in range(10)]
        seqs.append((u, seq))
    _write_user_events(spark, tmp_path, seqs)
    fast = ev_markov_mixing_time(spark, str(tmp_path)).collect()[0]

    # sticky cycle: a->a (90%), a->b (10%) etc: slow mixing
    seqs = []
    for u in range(30):
        seq = []
        st = 0
        for i in range(40):
            seq.append(pattern[st])
            if (u * 40 + i) % 10 == 9:
                st = (st + 1) % 3
        seqs.append((u, seq))
    _write_user_events(spark, tmp_path, seqs)
    slow = ev_markov_mixing_time(spark, str(tmp_path)).collect()[0]
    assert slow["slem"] > fast["slem"] + 0.3, (fast, slow)
    assert slow["relaxation_time"] > 3, slow
    assert fast["spectral_gap"] >= 0.45, fast


def _write_trade(spark, tmp_path, edges):
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


def test_von_neumann_entropy_ranks_structures(spark, tmp_path):
    from mister_spark.operators.extras240 import graph_von_neumann_entropy

    # star K1,7: concentrated spectrum, low entropy, connectivity 1
    _write_trade(spark, tmp_path, [(0, k) for k in range(1, 8)])
    star = graph_von_neumann_entropy(spark, str(tmp_path)).collect()[0]
    assert star["n_nodes"] == 8, star
    assert abs(star["algebraic_connectivity"] - 1.0) < 0.01, star

    # complete K8: flat spectrum (all nonzero eigenvalues = 8)
    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    _write_trade(spark, tmp_path, edges)
    comp = graph_von_neumann_entropy(spark, str(tmp_path)).collect()[0]
    assert abs(comp["algebraic_connectivity"] - 8.0) < 0.01, comp
    # K_n's nonzero spectrum is perfectly flat: entropy = ln(n-1)
    assert abs(comp["von_neumann_entropy"] - math.log(7)) < 0.01, comp
    assert comp["normalized_entropy"] > 0.99, comp
    assert star["normalized_entropy"] < comp["normalized_entropy"], (
        star, comp,
    )
