"""Wave 163 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_abc_xyz(spark):
    rows = registry.QUERIES["ds_abc_xyz"](spark, SF).collect()
    assert {r["abc_class"] for r in rows} <= {"A", "B", "C"}
    assert {r["xyz_class"] for r in rows} <= {"X", "Y", "Z"}
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 0.01
    # A rows carry most of the revenue despite fewer parts than C
    a = sum(r["revenue_share"] for r in rows if r["abc_class"] == "A")
    c = sum(r["revenue_share"] for r in rows if r["abc_class"] == "C")
    assert a > c


def test_newsvendor(spark):
    r = registry.QUERIES["ds_newsvendor"](spark, SF).collect()[0]
    # the 80% quantile stock sits above mean demand
    assert r["stock_level"] > r["mean_demand"] > 0
    # overage risk dominates at a stock above the mean
    assert r["exp_leftover"] > r["exp_shortage"] >= 0
    assert r["critical_ratio"] == 0.8
