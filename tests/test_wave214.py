"""Wave 214 behavior gates beyond the registry oracle parity.

The bow-tie decomposition must recover a planted core-cycle / IN /
OUT / disconnected structure exactly; the configuration-model
triangle score must read a clique as heavily over-closed and a star
as zero-closure.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_trade(spark, tmp_path, edges, copies=4):
    """edges: list of (src_nation, dst_nation); each edge gets
    `copies` lineitems so every pair intensity equals the mean."""
    sup, cus, orders, li = [], [], [], []
    sup_of, cus_of = {}, {}
    oid = lid = 0
    for s, d in edges:
        if s not in sup_of:
            sup_of[s] = len(sup_of) + 1
            sup.append((sup_of[s], s))
        if d not in cus_of:
            cus_of[d] = len(cus_of) + 1
            cus.append((cus_of[d], d))
    for s, d in edges:
        for _ in range(copies):
            oid += 1
            orders.append((oid, cus_of[d]))
            lid += 1
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


def test_bowtie_recovers_planted_structure(spark, tmp_path):
    from mister_spark.operators.extras214 import graph_scc_bowtie

    # core cycle 0->1->2->0; IN: 3->0; OUT: 2->4; other: 5->6
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (2, 4), (5, 6)]
    _write_trade(spark, tmp_path, edges)
    r = graph_scc_bowtie(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 7 and r["n_edges_kept"] == 6, r
    assert r["core_label"] == 0 and r["core_size"] == 3, r
    assert r["in_size"] == 1 and r["out_size"] == 1, r
    assert r["other_size"] == 2, r
    # 5 SCCs: {0,1,2}, {3}, {4}, {5}, {6}
    assert r["n_scc"] == 5, r


def _write_baskets(spark, tmp_path, baskets):
    """baskets: list of part lists; each becomes one order."""
    rows = []
    for oid, parts in enumerate(baskets, start=1):
        for p in parts:
            rows.append((oid, p))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "lineitem.parquet"))


def test_config_triangles_scores_clique_vs_star(spark, tmp_path):
    from mister_spark.operators.extras214 import graph_config_triangles

    # K5: four identical 5-part baskets -> every pair weight 4 >= 3
    _write_baskets(spark, tmp_path, [[1, 2, 3, 4, 5]] * 4)
    r = graph_config_triangles(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 5 and r["n_edges"] == 10, r
    assert r["triangles"] == 10, r
    # degrees all 4: S1=20, S2=60 -> E[T]=(1/6)*27=4.5
    assert r["expected_triangles"] == 4.5, r
    assert r["surprise_ratio"] == 2.2222, r

    # star K1,6: hub co-occurs with each leaf 3x, leaves never meet
    star = []
    for leaf in range(2, 8):
        star += [[1, leaf]] * 3
    _write_baskets(spark, tmp_path, star)
    r = graph_config_triangles(spark, str(tmp_path)).collect()[0]
    assert r["triangles"] == 0, r
    assert r["surprise_ratio"] == 0.0, r
    # degree sequence alone predicts a little closure (hub stubs)
    assert r["expected_triangles"] > 0, r
