"""Wave 264 behavior gates beyond oracle parity."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras264 import IRR_HI, IRR_LO, SWEEP_K

registry.load_all()

SF = "/root/testdata/sf0.01"


def test_sweep_cut_curve_shape(spark):
    rows = registry.QUERIES["graph_ppr_sweep_cut"](spark, SF).collect()
    assert 0 < len(rows) <= SWEEP_K
    by_k = {r["k"]: r for r in rows}
    assert sorted(by_k) == list(range(1, len(rows) + 1))
    best = [r for r in rows if r["is_best"] == 1]
    assert len(best) == 1
    phis = [r["phi"] for r in rows]
    assert best[0]["phi"] == min(phis)
    for r in rows:
        # cut and volume accounting: 0 <= cut <= vol, phi in (0, 1]
        assert 0 <= r["cut"] <= r["vol"]
        assert 0.0 <= r["phi"] <= 1.0
    # vol strictly increases along the sweep
    vols = [by_k[k]["vol"] for k in sorted(by_k)]
    assert all(a < b for a, b in zip(vols, vols[1:]))


def test_irr_npv_root_and_bracket(spark):
    rows = registry.QUERIES["fin_irr"](spark, SF).collect()
    assert len(rows) >= 3  # market segments
    for r in rows:
        assert IRR_LO <= r["irr_monthly"] <= IRR_HI
        assert r["n_months"] > 12
        assert r["outlay"] > 0
        # annualization consistency on the emitted grid
        a = (1 + r["irr_monthly"]) ** 12 - 1
        assert abs(a - r["irr_annual"]) < 5e-3
