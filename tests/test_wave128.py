"""Wave 128 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_meta_analysis(spark):
    r = registry.QUERIES["stat_meta_analysis"](spark, SF).collect()[0]
    assert r["strata"] == 7
    assert r["q_stat"] >= 0
    assert 0.0 <= r["i_squared"] <= 1.0
    # both pooled effects must lie inside the plausible spend range
    assert abs(r["effect_fixed"]) < 100000
    assert abs(r["effect_random"]) < 100000


def test_partition_balance(spark):
    r = registry.QUERIES["mr_partition_balance"](spark, SF).collect()[0]
    assert r["partitions"] <= 16
    assert r["rows"] == 6000
    assert r["max_over_mean"] >= 1.0
    # hash partitioning on a high-cardinality key stays near-balanced
    assert r["max_over_mean"] < 2.0
    assert r["cv"] < 0.5


def test_loo_ablation_plan(spark):
    rows = registry.QUERIES["ds_loo_ablation_plan"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["tokens_removed"] > 0
        assert r["tokens_remaining"] > 0
        assert 0.9 < r["remaining_share"] < 1.0  # 20 similar sources
