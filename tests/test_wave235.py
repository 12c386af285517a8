"""Wave 235 behavior gates beyond the registry oracle parity.

Core-periphery must recover a planted clique-plus-spokes structure
(core = the clique, fit near 1) and read a ring as coreless;
memorization tiers must match a hand-built duplication profile.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


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


def test_core_periphery_finds_planted_club(spark, tmp_path):
    from mister_spark.operators.extras235 import graph_core_periphery

    # core: K4 on {0,1,2,3}; periphery: spokes 10..17, one per core
    # node, no periphery-periphery edges
    core = [0, 1, 2, 3]
    edges = [
        (a, b) for i, a in enumerate(core) for b in core[i + 1 :]
    ]
    for k, p in enumerate(range(10, 18)):
        edges.append((core[k % 4], p))
    _write_trade(spark, tmp_path, edges)
    r = graph_core_periphery(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 12 and r["n_edges"] == 14, r
    assert r["core_size"] == 4, r
    assert r["core_density"] == 1.0, r
    assert r["periphery_density"] == 0.0, r
    assert r["fit"] == 1.0, r

    # ring of 10: every node degree 2, no core anywhere
    ring = [(i, (i + 1) % 10) for i in range(10)]
    _write_trade(spark, tmp_path, ring)
    r = graph_core_periphery(spark, str(tmp_path)).collect()[0]
    # best a ring can do: a 2-node "core" on one edge, fit 0.75 —
    # well short of the planted-club case's clean 1.0
    assert r["fit"] < 0.8, r
    assert r["periphery_density"] > 0.0, r


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_memorization_tiers_match_hand_profile(spark, tmp_path):
    from mister_spark.operators.extras235 import ds_memorization_risk

    ten = " ".join(f"w{i}" for i in range(10))
    twenty = " ".join(f"v{i}" for i in range(20))
    docs = []
    did = 0
    # 6 unique docs of 10 tokens
    for i in range(6):
        docs.append((did, ten + f" u{i}"))
        did += 1
    # one group of 3 copies (low tier), 20 tokens
    for _ in range(3):
        docs.append((did, twenty))
        did += 1
    # one group of 5 copies (high tier), 10 tokens
    for _ in range(5):
        docs.append((did, ten))
        did += 1
    _write_docs(spark, tmp_path, docs)
    out = {r["tier"]: r for r in ds_memorization_risk(spark, str(tmp_path)).collect()}
    assert out["unique"]["n_docs"] == 6 and out["unique"]["excess_copies"] == 0
    assert out["low"]["n_docs"] == 3 and out["low"]["n_groups"] == 1
    assert out["low"]["excess_copies"] == 2
    assert out["high"]["n_docs"] == 5 and out["high"]["excess_copies"] == 4
    assert abs(out["high"]["pct_docs"] - 5 / 14) < 1e-3
    assert out["low"]["avg_tokens"] == 20.0
