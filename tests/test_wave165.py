"""Wave 165 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_price_index(spark):
    r = registry.QUERIES["fin_price_index"](spark, SF).collect()[0]
    assert r["basket_parts"] > 0
    # stationary TPC-H prices: indices near 1, Fisher between L and P
    for k in ("laspeyres", "paasche", "fisher"):
        assert 0.7 < r[k] < 1.3
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert lo - 1e-4 <= r["fisher"] <= hi + 1e-4


def test_discount_depth(spark):
    rows = registry.QUERIES["fin_discount_depth"](spark, SF).collect()
    assert len(rows) == 8
    dd = [r["discount_dollars"] for r in rows]
    assert dd == sorted(dd, reverse=True)
    for r in rows:
        assert 0 <= r["avg_discount"] <= 0.1  # uniform 0..10% discounts
        assert 0 <= r["deep_share"] <= 1
