"""Wave 182 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_hts_reconcile_structure(spark):
    rows = registry.QUERIES["ev_hts_reconcile"](spark, SF).collect()
    assert len(rows) == 5  # five regions
    for r in rows:
        # the nonlinear forecaster must actually break coherence
        assert abs(r["coherence_gap"]) > 0
        assert (
            abs(r["fc_direct"] - r["fc_bottom_up"] - r["coherence_gap"])
            < 0.05
        )
        assert r["bu_nation_mae"] > 0 and r["td_nation_mae"] > 0
        assert r["nations"] >= 1
