"""Wave 164 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_safety_stock(spark):
    r = registry.QUERIES["ds_safety_stock"](spark, SF).collect()[0]
    assert r["daily_demand"] > 0 and r["lead_time_days"] > 0
    # lead-time variance makes the full formula exceed demand-only
    assert r["safety_stock"] > r["demand_only_stock"] > 0
    assert r["cycle_stock"] > 0


def test_eoq(spark):
    rows = registry.QUERIES["ds_eoq"](spark, SF).collect()
    assert len(rows) == 8
    ds = [r["annual_demand"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        assert r["eoq_units"] > 0
        # orders/yr * EOQ reproduces annual demand (square-root law)
        assert abs(r["orders_per_year"] * r["eoq_units"]
                   - r["annual_demand"]) / r["annual_demand"] < 0.02
        assert r["annual_oh_cost"] > 0
