"""Wave 224 behavior gates beyond the registry oracle parity.

Temporal reachability must block the planted months-decreasing path
that static closure sees; the Merkle root must match an independent
reference construction and flip on a one-cent tamper.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def _write_trade_months(spark, tmp_path, edges):
    """edges: list of (src_nation, dst_nation, 'YYYY-MM')."""
    sup, cus, orders, li = [], [], [], []
    sup_of, cus_of = {}, {}
    oid = 0
    for s, d, ym in edges:
        if s not in sup_of:
            sup_of[s] = len(sup_of) + 1
            sup.append((sup_of[s], s))
        if d not in cus_of:
            cus_of[d] = len(cus_of) + 1
            cus.append((cus_of[d], d))
        oid += 1
        orders.append((oid, cus_of[d], f"{ym}-10"))
        li.append((oid, sup_of[s]))
    base = str(tmp_path)
    spark.createDataFrame(sup, "s_suppkey long, s_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate_s string"
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(li, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "lineitem.parquet"))


def test_temporal_closure_respects_the_arrow_of_time(spark, tmp_path):
    from mister_spark.operators.extras224 import graph_temporal_reachability

    # 0 -> 1 in May, 1 -> 2 in March: static 0->2, temporally BLOCKED
    # 3 -> 4 in Feb, 4 -> 5 in June: temporally open
    edges = [
        (0, 1, "2024-05"), (1, 2, "2024-03"),
        (3, 4, "2024-02"), (4, 5, "2024-06"),
    ]
    _write_trade_months(spark, tmp_path, edges)
    r = graph_temporal_reachability(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 6, r
    # static: 4 edges + 0->2 + 3->5 = 6 ordered pairs
    assert r["static_pairs"] == 6, r
    # temporal: the 4 edges + 3->5; 0->2 blocked
    assert r["temporal_pairs"] == 5, r
    assert r["blocked_pairs"] == 1, r


def _write_customers(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_acctbal double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "customer.parquet")
    )


def _reference_root(rows):
    by_z = {}
    for ck, z, bal in rows:
        cents = int(bal * 100 + 0.5) if bal >= 0 else -int(-bal * 100 + 0.5)
        # mirror floor(x*100+0.5) for the balances used in tests (>0)
        cents = int(__import__("math").floor(bal * 100 + 0.5))
        by_z.setdefault(z, []).append(
            hashlib.md5(f"{ck}:{cents}".encode()).hexdigest()
        )
    leaves = [
        hashlib.md5("".join(sorted(hs)).encode()).hexdigest()
        for z, hs in sorted(by_z.items())
    ]
    level = leaves
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            if i + 1 < len(level):
                nxt.append(
                    hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest()
                )
            else:
                nxt.append(level[i])
        level = nxt
    return level[0], len(leaves)


def test_merkle_root_matches_reference_and_detects_tamper(spark, tmp_path):
    from mister_spark.operators.extras224 import io_merkle_manifest

    rows = [
        (ck, ck % 5, 100.0 + ck * 3.21) for ck in range(1, 41)
    ]
    _write_customers(spark, tmp_path, rows)
    r = io_merkle_manifest(spark, str(tmp_path)).collect()[0]
    ref_root, n_leaves = _reference_root(rows)
    assert r["n_leaves"] == n_leaves == 5, r
    assert r["root_hash"] == ref_root, (r, ref_root)
    # 5 leaves -> 3 -> 2 -> 1: depth 3
    assert r["tree_depth"] == 3 == r["proof_hashes"], r

    # tamper one balance by a cent: the root must flip
    rows2 = [(ck, z, b + (0.01 if ck == 17 else 0.0)) for ck, z, b in rows]
    _write_customers(spark, tmp_path, rows2)
    r2 = io_merkle_manifest(spark, str(tmp_path)).collect()[0]
    assert r2["root_hash"] != r["root_hash"], r2
