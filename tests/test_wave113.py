"""Wave 113 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_analyze_stats_present(spark):
    r = registry.QUERIES["sql_analyze_stats"](spark, SF).collect()[0]
    assert r["table_rows"] == 1500
    assert r["has_size_stats"] == 1
    assert r["rowcount_in_stats"] == 1
    # HLL-based distinct count: within a few % of the true 150
    assert 140 <= r["custkey_distinct"] <= 160
    assert r["custkey_nulls"] == 0


def test_robustness_ordering(spark):
    r = registry.QUERIES["stat_robustness_demo"](spark, SF).collect()[0]
    # 1% gross corruption: the mean moves ~1%*factor, the median barely
    assert r["mean_drift"] > r["median_drift"]
    assert r["mean_drift"] > 0.1  # x100 on 1% of rows ≈ +100% of total
    assert r["median_drift"] < 0.05
    assert r["trimmed_drift"] < r["mean_drift"]


def test_near_dup_leakage_bounds(spark):
    r = registry.QUERIES["ds_near_dup_leakage"](spark, SF).collect()[0]
    assert r["test_docs"] > 0
    assert 0 <= r["leaked_docs"] <= r["test_docs"]
    assert 0.0 <= r["leak_rate"] <= 1.0
