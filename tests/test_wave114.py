"""Wave 114 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_competing_risks_partition(spark):
    r = registry.QUERIES["ev_competing_risks"](spark, SF).collect()[0]
    assert r["horizon_hours"] == 48
    assert 0.0 <= r["cif_purchase"] <= 1.0
    assert 0.0 <= r["cif_error"] <= 1.0
    # the defining CIF property: causes jointly bounded by 1
    assert r["cif_any"] <= 1.0 + 1e-9
    assert abs(r["cif_any"] - (r["cif_purchase"] + r["cif_error"])) < 1e-3


def test_closeness_sampled(spark):
    rows = registry.QUERIES["graph_closeness_sampled"](spark, SF).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["reached"] >= 1
        assert 0.0 < r["coverage"] <= 1.0
        assert 0.0 <= r["closeness"] <= 1.0


def test_default_columns_materialize(spark):
    rows = {
        (r["status"], r["region"]): r["n"]
        for r in registry.QUERIES["sql_default_columns"](spark, SF).collect()
    }
    # two partial inserts picked up both defaults
    assert rows[("open", "unknown")] == 2
    # explicit status with default region
    assert rows[("closed", "unknown")] == 1
    # explicit DEFAULT keyword + explicit region
    assert rows[("open", "emea")] == 1
