"""Wave 155 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_staffing_schedule(spark):
    rows = registry.QUERIES["ev_staffing_schedule"](spark, SF).collect()
    assert len(rows) == 24
    for r in rows:
        assert r["arrivals_per_hour"] > 0
        assert 1 <= r["servers_needed"] <= 9
    # busier hours need at least as many servers (spot check extremes)
    by_load = sorted(rows, key=lambda r: r["arrivals_per_hour"])
    assert by_load[0]["servers_needed"] <= by_load[-1]["servers_needed"]


def test_median_ci(spark):
    r = registry.QUERIES["stat_median_ci"](spark, SF).collect()[0]
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]
    assert r["ci_lo"] < r["ci_hi"]
