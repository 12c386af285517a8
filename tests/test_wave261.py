"""Wave 261 behavior gates beyond the registry oracle parity.

Cayley check: the complete graph K_n has exactly n^(n-2) spanning
trees, and a path graph has exactly 1 — the matrix-tree implementation
must reproduce both closed forms.
"""

from __future__ import annotations

import math
import os

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _write_trade(spark, base, edges):
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


def test_cayley_complete_graph(spark, tmp_path):
    from mister_spark.operators.extras261 import graph_spanning_trees

    n = 5
    edges = [(i, j) for i in range(n) for j in range(n) if i < j]
    _write_trade(spark, str(tmp_path), edges)
    r = graph_spanning_trees(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == n and r["connected"] == 1
    want = (n - 2) * math.log10(n)  # Cayley: n^(n-2) trees
    assert abs(r["log10_spanning_trees"] - want) < 1e-3


def test_path_graph_single_tree(spark, tmp_path):
    from mister_spark.operators.extras261 import graph_spanning_trees

    _write_trade(spark, str(tmp_path), [(0, 1), (1, 2), (2, 3)])
    r = graph_spanning_trees(spark, str(tmp_path)).collect()[0]
    assert r["connected"] == 1
    assert abs(r["log10_spanning_trees"]) < 1e-3  # exactly 1 tree


def test_real_graph_connected(spark):
    r = registry.QUERIES["graph_spanning_trees"](spark, SF).collect()[0]
    assert r["connected"] == 1
    assert r["n_nonzero_eigs"] == r["n_nodes"] - 1
    assert r["log10_spanning_trees"] > 10  # dense trade graph
