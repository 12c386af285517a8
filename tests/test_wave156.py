"""Wave 156 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_group_by_all(spark):
    rows = registry.QUERIES["sql_group_by_all"](spark, SF).collect()
    assert sum(r["n"] for r in rows) == 1500
    assert len(rows) == 15  # 5 priorities x 3 statuses


def test_prop_diff_ci_covers_zero(spark):
    r = registry.QUERIES["stat_prop_diff_ci"](spark, SF).collect()[0]
    assert 0.0 <= r["rate_urgent"] <= 1.0
    assert 0.0 <= r["rate_other"] <= 1.0
    assert r["ci_lo"] < r["diff"] < r["ci_hi"]
    # independent priority/status: the CI must cover zero
    assert r["ci_lo"] <= 0.0 <= r["ci_hi"]
