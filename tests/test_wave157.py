"""Wave 157 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_conductance(spark):
    r = registry.QUERIES["graph_conductance"](spark, SF).collect()[0]
    assert r["communities"] >= 2
    assert 0.0 <= r["best_conductance"] <= r["mean_conductance"] <= 1.0
    # brand-agnostic baskets: conductance far from a real community's
    # near-zero boundary (small-sample noise puts it ~0.5 here)
    assert r["mean_conductance"] > 0.2


def test_write_modes(spark):
    rows = {r["mode"]: r["observed"] for r in
            registry.QUERIES["io_write_modes"](spark, SF).collect()}
    assert rows["overwrite_fresh"] == 100
    assert rows["append"] == 200
    assert rows["ignore"] == 200  # no-op on existing path
    assert rows["overwrite_again"] == 100
    assert rows["errorifexists_raised"] == 1
