"""Wave 152 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_neighbor_degree_curve(spark):
    rows = registry.QUERIES["graph_neighbor_degree_curve"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["degree"] >= 1
        assert r["nodes"] >= 1
        assert r["mean_neighbor_degree"] >= 1.0


def test_neyman_allocation(spark):
    rows = registry.QUERIES["ds_neyman_allocation"](spark, SF).collect()
    assert len(rows) == 20
    prop = sum(r["proportional_labels"] for r in rows)
    ney = sum(r["neyman_labels"] for r in rows)
    # both allocations land near the budget (integer rounding)
    assert abs(prop - 100) <= 5
    assert abs(ney - 100) <= 5
    for r in rows:
        assert r["quality_sd"] >= 0
