"""Wave 127 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_tie_strength(spark):
    r = registry.QUERIES["graph_tie_strength"](spark, SF).collect()[0]
    assert r["edges"] > 0
    assert 0.0 <= r["mean_overlap"] <= 1.0
    assert 0 <= r["bridges"] <= r["edges"]
    assert abs(r["bridge_share"] - round(r["bridges"] / r["edges"], 4)) < 1e-3


def test_simpson_scan(spark):
    r = registry.QUERIES["stat_simpson_scan"](spark, SF).collect()[0]
    assert r["strata"] == 7
    assert r["pooled_or"] > 0
    assert 0 <= r["flipped_strata"] <= r["strata"]


def test_retention_plan_monotone(spark):
    rows = sorted(
        registry.QUERIES["io_retention_plan"](spark, SF).collect(),
        key=lambda r: r["drop_through_year"],
    )
    assert len(rows) >= 3
    shares = [r["reclaimed_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-6  # dropping everything reclaims all
    total = rows[-1]["reclaimed_bytes"]
    assert total == sum(r["partition_bytes"] for r in rows)
