"""Wave 111 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_k_truss_converges(spark):
    rows = sorted(
        registry.QUERIES["graph_k_truss"](spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert rows
    # monotone peel: edges never increase
    for r in rows:
        assert r["edges_after"] <= r["edges_before"]
    # fixpoint reached: the final round keeps everything
    assert rows[-1]["edges_after"] == rows[-1]["edges_before"]
    # truss is strictly smaller than the input graph here
    assert rows[0]["edges_after"] < rows[0]["edges_before"]


def test_time_to_value(spark):
    r = registry.QUERIES["ev_time_to_value"](spark, SF).collect()[0]
    assert 0 < r["reached"] <= r["customers"]
    assert 0.0 < r["reach_rate"] <= 1.0
    assert r["p25_days"] <= r["p50_days"] <= r["p75_days"]
    assert r["p25_days"] >= 0


def test_dedup_method_venn(spark):
    r = registry.QUERIES["dd_method_venn"](spark, SF).collect()[0]
    assert r["lexical_pairs"] == r["both"] + r["lexical_only"]
    assert r["semantic_pairs"] == r["both"] + r["semantic_only"]
    assert 0.0 <= r["jaccard"] <= 1.0
    # on this corpus the two families find different duplication modes
    assert r["lexical_pairs"] > 0 and r["semantic_pairs"] > 0
