"""Wave 96 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras96 import RMST_TAU

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_rmst_bounds(spark):
    r = registry.QUERIES["ml_survival_rmst"](spark, SF).collect()[0]
    assert r["tau"] == RMST_TAU
    # RMST is an area under a [0,1] curve over [0, tau]
    assert 0.0 < r["rmst_hours"] <= RMST_TAU


def test_higher_order_arrays_consistency(spark):
    rows = registry.QUERIES["sql_higher_order_arrays"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_items"] >= 1
        # discounted sum can never exceed the raw dot-with-quantity
        # (quantities >= 1, discounts >= 0)
        assert r["sum_disc"] <= r["dot_pq"] + 1e-6
        assert r["any_big"] in (0, 1)


def test_seasonal_strength_bounds(spark):
    r = registry.QUERIES["stat_seasonal_strength"](spark, SF).collect()[0]
    assert r["var_detrended"] > 0
    assert r["var_resid"] > 0
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    # variance decomposition: residual variance cannot exceed
    # detrended variance by more than rounding
    assert r["var_resid"] <= r["var_detrended"] * 1.01 + 1e-4
