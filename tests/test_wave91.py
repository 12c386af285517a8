"""Wave 91 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_udtf_expands_rows(spark):
    rows = registry.QUERIES["sql_python_udtf"](spark, SF).collect()
    assert len(rows) % 4 == 0  # 4 milestones per qualifying order
    by_order = {}
    for r in rows:
        by_order.setdefault(r["o_orderkey"], []).append(r)
    for ok, rs in list(by_order.items())[:5]:
        pcts = sorted(r["pct"] for r in rs)
        assert pcts == [0.25, 0.5, 0.75, 1.0]
        full = next(r for r in rs if r["pct"] == 1.0)
        half = next(r for r in rs if r["pct"] == 0.5)
        assert abs(full["amount"] - 2 * half["amount"]) < 1.0


def test_cdc_chunking_profile(spark):
    r = registry.QUERIES["dd_cdc_chunking"](spark, SF).collect()[0]
    assert r["total_chunks"] > 0
    assert 0 < r["distinct_chunks"] <= r["total_chunks"]
    assert r["dup_chunks"] == r["total_chunks"] - r["distinct_chunks"]
    # mask 16 over a 4-token window: chunks should average well above
    # a single token and far below whole docs
    assert 3.0 < r["avg_chunk_len"] < 60.0
    # synthetic docs share vocabulary heavily → real chunk-level dup
    assert r["dup_ratio"] > 0.01


def test_gamma_poisson_shrinkage(spark):
    rows = registry.QUERIES["stat_gamma_poisson"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo"] <= r["posterior_rate"] <= r["ci_hi"]
        # posterior sits between prior mean (2.0) and the MLE
        lo, hi = sorted((2.0, r["mle_rate"]))
        assert lo - 1e-9 <= r["posterior_rate"] <= hi + 1e-9


def test_theta_forecast_backtest(spark):
    rows = registry.QUERIES["ev_theta_forecast"](spark, SF).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["forecast"] > 0
        assert r["ape"] >= 0
    # a sane forecaster on steady volume: median APE under 60%
    apes = sorted(r["ape"] for r in rows)
    assert apes[len(apes) // 2] < 0.6
