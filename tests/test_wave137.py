"""Wave 137 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_growth_slopes(spark):
    r = registry.QUERIES["stat_growth_slopes"](spark, SF).collect()[0]
    assert r["customers"] > 0
    assert 0.0 <= r["share_growing"] <= 1.0
    assert r["slope_sd"] >= 0
    # flat synthetic spend: roughly half the customers 'grow'
    assert 0.2 < r["share_growing"] < 0.8


def test_clique_verified(spark):
    r = registry.QUERIES["graph_clique_heuristic"](spark, SF).collect()[0]
    assert r["clique_size"] >= 3  # at least a triangle
    assert r["verified"] == 1
    assert r["internal_edges"] == r["expected_edges"]


def test_determinism_audit(spark):
    rows = registry.QUERIES["io_determinism_audit"](spark, SF).collect()
    assert len(rows) == 5
    # every audited operator must reproduce bit-identically
    assert all(r["deterministic"] == 1 for r in rows)
    assert len({r["hash_prefix"] for r in rows}) == 5
