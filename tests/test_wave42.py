"""Wave 42 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ndcg_bounds_and_perfect_case(spark):
    """NDCG in [0, 1]; a query whose every top-5 hit is relevant must
    score exactly 1 (DCG == IDCG by construction)."""
    rows = registry.QUERIES["ml_ndcg"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["n_rel"] <= 5
        if r["n_rel"] == 5:
            assert r["ndcg"] == 1.0
        if r["n_rel"] == 0:
            assert r["ndcg"] == 0.0


def test_mix_drift_shares_and_terms(spark):
    """Smoothed shares per half sum to ~1; PSI terms are nonnegative
    (same-sign (p-q) and ln(p/q))."""
    rows = registry.QUERIES["ev_mix_drift"](spark, SF).collect()
    assert len(rows) == 5
    assert abs(sum(r["share_1"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["share_2"] for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert r["psi_term"] >= 0


def test_term_burstiness_ordering(spark):
    """Top-20 by burstiness, each ≥ 1 (a term occurs at least once
    per containing doc) and df respects the min-df gate."""
    rows = registry.QUERIES["tx_term_burstiness"](spark, SF).collect()
    assert len(rows) == 20
    vals = [r["burstiness"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["burstiness"] >= 1.0
        assert r["df"] >= 5
        assert r["tf_total"] >= r["df"]


def test_seasonal_decompose_factors_balance(spark):
    """Seven ISO weekdays; seasonal factors roughly cancel (they are
    means of a detrended series), and noise yardstick is positive."""
    rows = registry.QUERIES["ev_seasonal_decompose"](spark, SF).collect()
    assert sorted(r["dow"] for r in rows) == list(range(1, 8))
    weighted = sum(r["seasonal"] * r["n_days"] for r in rows)
    total_days = sum(r["n_days"] for r in rows)
    # day-weighted mean of detrended values is ~0 by construction of
    # the centered MA (edge windows keep it from being exactly 0)
    assert abs(weighted / total_days) < 200.0
    for r in rows:
        assert r["mean_abs_detrended"] >= 0
