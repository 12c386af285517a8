"""Wave 246 behavior gates beyond the registry oracle parity.

Katz centrality must match an independent python replication of the
attenuated-path recursion on a planted star-plus-chain graph (and rank
the chain-fed hub above a degree-tied plain hub). Sharpe/Sortino must
read a planted asymmetric return stream: steady growth with rare
crashes gives Sortino below Sharpe only when downside dominates, and a
symmetric wobble keeps them close.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_trade(spark, tmp_path, edges):
    """edges: list of (src_nation, dst_nation) directed pairs."""
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


def _katz_ref(edges, iters, alpha):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    x = {v: 1.0 for v in nodes}
    for _ in range(iters):
        nx = {}
        for v in nodes:
            inx = sum(x[u] for u, w in edges if w == v)
            nx[v] = 1.0 + alpha * inx
        x = nx
    return x


def test_katz_matches_reference_and_sees_chains(spark, tmp_path):
    from mister_spark.operators.extras246 import (
        KATZ_ALPHA,
        KATZ_ITERS,
        graph_katz,
    )

    # hub 10 fed by three chains (1->2->10 style); hub 20 fed by three
    # isolated leaves — equal in-degree, different path mass
    edges = [
        (1, 2), (2, 10), (3, 4), (4, 10), (5, 6), (6, 10),
        (11, 20), (12, 20), (13, 20),
    ]
    _write_trade(spark, tmp_path, edges)
    got = {r["node"]: r for r in graph_katz(spark, str(tmp_path)).collect()}
    ref = _katz_ref(edges, KATZ_ITERS, KATZ_ALPHA)
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for node, want in ref.items():
        assert got[node]["katz"] == g6(want), (node, got[node], want)
    assert got[10]["in_degree"] == got[20]["in_degree"] == 3
    assert got[10]["katz"] > got[20]["katz"]  # chains beat bare leaves


def _write_revenue(spark, tmp_path, daily_cents):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (
            i + 1,
            1,
            (d0 + datetime.timedelta(days=i)).strftime("%Y-%m-%d"),
            c / 100.0,
        )
        for i, c in enumerate(daily_cents)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate string, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_sharpe_sortino_read_downside_asymmetry(spark, tmp_path):
    from mister_spark.operators.extras246 import fin_sharpe_sortino

    # steady +1% grind with two -20% crashes: downside deviation is
    # dominated by the crashes, so Sortino < Sharpe
    cents = [100000]
    for i in range(40):
        prev = cents[-1]
        cents.append(int(prev * (0.8 if i in (15, 30) else 1.01)))
    _write_revenue(spark, tmp_path, cents)
    r = fin_sharpe_sortino(spark, str(tmp_path)).collect()[0]
    assert r["n_returns"] == 40
    assert r["daily_vol"] > 0
    assert r["sortino_annual"] < r["sharpe_annual"], r

    # symmetric alternation: mean ~0, both ratios near zero
    cents2 = [100000]
    for i in range(40):
        cents2.append(int(cents2[-1] * (1.02 if i % 2 == 0 else 1 / 1.02)))
    _write_revenue(spark, tmp_path, cents2)
    r2 = fin_sharpe_sortino(spark, str(tmp_path)).collect()[0]
    assert abs(r2["sharpe_annual"]) < 1.0, r2
