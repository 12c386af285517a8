"""Wave 145 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_records_test(spark):
    r = registry.QUERIES["stat_records_test"](spark, SF).collect()[0]
    assert r["days"] >= 25
    assert 1 <= r["record_days"] <= r["days"]
    # expected records ≈ ln(n) + gamma: for 30 days that's ~4
    assert 2.0 < r["expected_records"] < 8.0
    # flat synthetic revenue: records arrive at the exchangeable rate
    assert abs(r["z_approx"]) < 3.0


def test_column_type_advisor(spark):
    rows = {r["column"]: r for r in
            registry.QUERIES["io_column_type_advisor"](spark, SF).collect()}
    assert rows["event_id"]["suggested_role"] == "id"
    assert rows["ts"]["suggested_role"] == "event_time"
    assert rows["event_type"]["suggested_role"] == "categorical"
    assert rows["value"]["suggested_role"] == "measure"
    for r in rows.values():
        assert 0.0 <= r["null_rate"] <= 1.0
