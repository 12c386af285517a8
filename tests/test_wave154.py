"""Wave 154 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_revenue_hhi(spark):
    r = registry.QUERIES["ev_revenue_hhi"](spark, SF).collect()[0]
    assert r["customers"] > 0
    # HHI bounded by [1/n, 1]
    assert 1.0 / r["customers"] <= r["hhi"] <= 1.0
    assert 1.0 <= r["effective_customers"] <= r["customers"]
    assert 0.0 < r["effective_share"] <= 1.0
    # near-uniform synthetic customers: high effective share
    assert r["effective_share"] > 0.5


def test_range_surface(spark):
    r = registry.QUERIES["sql_range_surface"](spark, SF).collect()[0]
    assert r["calendar_days"] == 365
    assert 0 <= r["zero_order_days"] < 365
    assert r["avg_orders_per_day"] > 0
