"""Wave 131 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_woe_iv_null_feature(spark):
    rows = registry.QUERIES["ml_woe_iv"](spark, SF).collect()
    assert len(rows) == 10
    ivs = {r["total_iv"] for r in rows}
    assert len(ivs) == 1
    # balance-independent segment: IV must land in the 'weak' zone
    assert list(ivs)[0] < 0.3
    total_pos = sum(r["positives"] for r in rows)
    assert total_pos > 0


def test_velocity_rule_monotone(spark):
    rows = sorted(
        registry.QUERIES["ev_velocity_rule"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [3, 5, 8]
    ev_flags = [r["events_flagged"] for r in rows]
    us_flags = [r["users_flagged"] for r in rows]
    # stricter thresholds flag fewer
    assert ev_flags == sorted(ev_flags, reverse=True)
    assert us_flags == sorted(us_flags, reverse=True)


def test_source_similarity(spark):
    rows = registry.QUERIES["tx_source_similarity"](spark, SF).collect()
    assert len(rows) == 10
    vals = [r["jsd"] for r in rows]
    assert vals == sorted(vals)
    # JS divergence (ln base) bounded by ln 2
    assert all(0.0 <= v <= 0.6932 for v in vals)
    assert all(r["source_a"] < r["source_b"] for r in rows)
