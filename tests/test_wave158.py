"""Wave 158 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_trending_terms(spark):
    rows = registry.QUERIES["tx_trending_terms"](spark, SF).collect()
    assert len(rows) == 10
    ratios = [r["trend_ratio"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    assert all(r["trend_ratio"] > 0 for r in rows)
    assert all(0 < r["share_recent"] < 1 for r in rows)


def test_payback_period(spark):
    r = registry.QUERIES["ev_payback_period"](spark, SF).collect()[0]
    assert r["assumed_cac"] == 200.0
    assert r["ltv_at_horizon"] > 0
    # payback day, when reached, is within the data horizon
    if r["payback_day"] is not None:
        assert 0 <= r["payback_day"] <= 3700
