"""Wave 188 behavior gates beyond the registry oracle parity.

Harmonic centrality must rank a planted hub above every spoke on a
synthetic star; the isotonic fit must be monotone, must pool a planted
violator pair to their weighted mean, and must pass through the raw
means when they are already monotone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_harmonic_hub_beats_leaf(spark):
    from mister_spark.operators.extras188 import graph_harmonic_centrality

    rows = {r["node"]: r for r in graph_harmonic_centrality(spark, SF).collect()}
    # the nation trade graph is near-complete: every node reached by
    # most sources, harmonic within (0, sources-1]
    assert len(rows) == 25
    for r in rows.values():
        assert 0 < r["harmonic"] <= 25
        assert r["reached"] >= 1


def test_harmonic_on_planted_star(spark, tmp_path):
    """Star graph via a synthetic trade fixture: nation 0 supplies
    every other nation (hub), spokes trade with nobody else. The hub's
    harmonic centrality must strictly exceed every spoke's, and all
    spokes tie."""
    from mister_spark.operators.extras188 import graph_harmonic_centrality

    n = 6
    # one supplier per nation; customer in nation j buys from supplier
    # in nation 0 only (orders o_custkey=j -> customer nation j)
    spark.createDataFrame(
        [(j, j) for j in range(n)], "s_suppkey long, s_nationkey long"
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "supplier.parquet"))
    spark.createDataFrame(
        [(j, j) for j in range(n)], "c_custkey long, c_nationkey long"
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "customer.parquet"))
    spark.createDataFrame(
        [(j, j) for j in range(1, n)], "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "orders.parquet"))
    spark.createDataFrame(
        [(j, 0) for j in range(1, n)], "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    rows = {
        r["node"]: r
        for r in graph_harmonic_centrality(spark, str(tmp_path)).collect()
    }
    hub, spokes = rows[0], [rows[j] for j in range(1, n)]
    assert all(hub["harmonic"] > s["harmonic"] for s in spokes)
    # spokes: 1/1 (hub) + (n-2)/2 (other spokes at distance 2)
    assert len({s["harmonic"] for s in spokes}) == 1
    assert abs(spokes[0]["harmonic"] - (1 + (n - 2) / 2)) < 1e-9
    assert hub["harmonic"] == n - 1  # n-1 direct neighbors


def test_isotonic_fit_is_monotone_and_pools_violators(spark, tmp_path):
    from mister_spark.operators.extras188 import ml_isotonic_regression

    # monotone except one planted violator: x=3 mean (10) > x=4 mean (6)
    rows = (
        [(1.0, 2.0)] * 4
        + [(2.0, 4.0)] * 4
        + [(3.0, 10.0)] * 4
        + [(4.0, 6.0)] * 4
        + [(5.0, 20.0)] * 4
    )
    spark.createDataFrame(rows, "l_quantity double, l_extendedprice double").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = {r["x"]: r for r in ml_isotonic_regression(spark, str(tmp_path)).collect()}
    fits = [out[x]["iso_fit"] for x in sorted(out)]
    assert fits == sorted(fits), fits  # monotone nondecreasing
    # untouched monotone points pass through their raw means
    assert out[1.0]["iso_fit"] == out[1.0]["mean_y"] == 2.0
    assert out[5.0]["iso_fit"] == out[5.0]["mean_y"] == 20.0
    # the violator pair pools to its weighted mean (10+6)/2 = 8
    assert out[3.0]["iso_fit"] == out[4.0]["iso_fit"] == 8.0
