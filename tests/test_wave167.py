"""Wave 167 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pvm_bridge(spark):
    rows = registry.QUERIES["fin_pvm_bridge"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        # exact algebraic reconciliation (rounding slack only)
        recon = (r["price_effect"] + r["volume_effect"]
                 + r["cross_effect"])
        assert abs(recon - r["delta_rev"]) < 0.05
    swings = [abs(r["delta_rev"]) for r in rows]
    assert swings == sorted(swings, reverse=True)


def test_vendor_scorecard(spark):
    rows = registry.QUERIES["ds_vendor_scorecard"](spark, SF).collect()
    assert len(rows) == 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert r["lines"] > 0
        assert 0 < r["avg_lead_days"] < 200  # order-to-ship averages months
        assert 0 <= r["ontime_share"] <= 1
