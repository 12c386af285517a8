"""Wave 260 behavior gates beyond the registry oracle parity.

Effective resistance must obey network physics: a planted two-path
triangle's pairwise resistance equals the parallel combination, and
on the real graph every resistance is positive and bounded by the
grounded series path.
"""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_effective_resistance_positive_and_sane(spark):
    rows = registry.QUERIES["graph_effective_resistance"](spark, SF).collect()
    assert len(rows) == 24
    for r in rows:
        assert r["r_eff"] > 0, r
        assert r["degree_share"] > 0  # every nation trades
    # hub-ness: higher degree shares should broadly mean lower
    # resistance — compare the extremes
    by_deg = sorted(rows, key=lambda r: r["degree_share"])
    low_deg = sum(r["r_eff"] for r in by_deg[:5]) / 5
    high_deg = sum(r["r_eff"] for r in by_deg[-5:]) / 5
    assert high_deg < low_deg


def test_effective_resistance_parallel_paths(spark):
    """Triangle 0-1-2 with unit-count edges: R(0,1) grounded at 0 is
    the parallel combination of the direct edge (r=1/w01) and the
    two-hop path (1/w12 + 1/w02), in normalized-weight units."""
    import os

    from mister_spark.operators.extras260 import graph_effective_resistance

    sup, cus, orders, li = [], [], [], []
    oid = 0
    # one lineitem per directed edge of the triangle
    edges = [(0, 1), (1, 2), (0, 2)]
    sup_of, cus_of = {}, {}
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
    import tempfile

    base = tempfile.mkdtemp()
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
    out = {
        r["nationkey"]: r["r_eff"]
        for r in graph_effective_resistance(spark, base).collect()
    }
    # symmetrized: each edge weight 1, total weight 6 -> wn = 1/6 each;
    # conductances g = 1/6; direct resistance 6, two-hop 12;
    # parallel: 1/(1/6 + 1/12) = 4
    assert abs(out[1] - 4.0) < 1e-3, out
    assert abs(out[2] - 4.0) < 1e-3, out
