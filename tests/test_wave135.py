"""Wave 135 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_recsys_coverage(spark):
    r = registry.QUERIES["ml_recsys_coverage"](spark, SF).collect()[0]
    assert r["sources"] > 0
    assert 0 < r["recommended_items"] <= 200  # catalog size at fixture
    assert 0.0 < r["catalog_coverage"] <= 1.0
    assert 0.0 < r["mean_brand_diversity"] <= 1.0


def test_ab_duration_monotone(spark):
    rows = sorted(
        registry.QUERIES["ev_ab_duration_plan"](spark, SF).collect(),
        key=lambda r: r["relative_mde"],
    )
    assert [r["relative_mde"] for r in rows] == [0.01, 0.02, 0.05]
    ns = [r["n_per_arm"] for r in rows]
    days = [r["days_needed"] for r in rows]
    # smaller MDEs require more sample and more days
    assert ns == sorted(ns, reverse=True)
    assert days == sorted(days, reverse=True)
    assert all(d >= 1 for d in days)


def test_edge_turnover(spark):
    r = registry.QUERIES["graph_edge_turnover"](spark, SF).collect()[0]
    assert r["edges_both"] <= min(r["edges_before"], r["edges_after"])
    assert 0.0 <= r["jaccard"] <= 1.0
    # relationships churn hard across halves — the op's finding
    assert r["jaccard"] < 0.5
