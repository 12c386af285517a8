"""Wave 144 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_partition_strategies_ordering(spark):
    rows = {r["strategy"]: r for r in
            registry.QUERIES["mr_partition_strategies"](spark, SF).collect()}
    assert set(rows) == {"hash", "range", "round_robin"}
    # round-robin is perfectly level; hash is level-in-expectation
    assert rows["round_robin"]["max_over_mean"] <= 1.001
    assert rows["hash"]["max_over_mean"] < 2.0
    assert rows["range"]["max_over_mean"] < 2.0
    for r in rows.values():
        assert r["partitions"] <= 16


def test_datetime_suite(spark):
    r = registry.QUERIES["sql_datetime_suite"](spark, SF).collect()[0]
    assert r["n"] == 1500
    # +30 days overshoots +1 month for dates in short months
    assert 0 < r["thirty_gt_month"] < r["n"]
    assert r["quarter_sum"] >= r["n"]  # quarters are 1..4
    assert r["distinct_weeks"] > 50  # multi-year span
    assert 0 <= r["month_end_orders"] < r["n"]
