"""Wave 250 behavior gates beyond the registry oracle parity.

Eccentricities on a planted path and star must match hand-computed
values (path: ends at diameter, middles at radius; star: hub center at
1, leaves at 2).
"""

from __future__ import annotations

import os


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
        orders.append((oid, cus_of[d], "2024-01-10"))
        li.append((oid, sup_of[s]))
    base = str(tmp_path)
    spark.createDataFrame(sup, "s_suppkey long, s_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate string"
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(li, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "lineitem.parquet"))


def test_path_graph_extent(spark, tmp_path):
    from mister_spark.operators.extras250 import graph_diameter

    # path 0-1-2-3 (directed edges, symmetrized by the op)
    _write_trade(spark, tmp_path, [(0, 1), (1, 2), (2, 3)])
    out = {r["node"]: r for r in graph_diameter(spark, str(tmp_path)).collect()}
    assert {n: r["eccentricity"] for n, r in out.items()} == {
        0: 3, 1: 2, 2: 2, 3: 3
    }
    r0 = out[0]
    assert r0["diameter"] == 3 and r0["radius"] == 2
    assert out[1]["is_center"] == 1 and out[2]["is_center"] == 1
    assert out[0]["is_periphery"] == 1 and out[3]["is_periphery"] == 1
    assert out[1]["is_periphery"] == 0


def test_star_graph_extent(spark, tmp_path):
    from mister_spark.operators.extras250 import graph_diameter

    _write_trade(spark, tmp_path, [(9, leaf) for leaf in (1, 2, 3, 4, 5)])
    out = {r["node"]: r for r in graph_diameter(spark, str(tmp_path)).collect()}
    assert out[9]["eccentricity"] == 1 and out[9]["is_center"] == 1
    for leaf in (1, 2, 3, 4, 5):
        assert out[leaf]["eccentricity"] == 2
        assert out[leaf]["is_periphery"] == 1
    assert out[9]["diameter"] == 2 and out[9]["radius"] == 1
