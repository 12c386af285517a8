"""Wave 48 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_snapshot_vacuum_audit(spark):
    r = registry.QUERIES["io_snapshot_vacuum"](spark, SF).collect()[0]
    assert r["n_versions_before"] == 3
    assert r["n_versions_after"] == 1
    assert r["n_dirs_deleted"] >= 2  # create + append dirs dropped
    assert r["rows_at_head"] == 50  # overwrite result intact
    assert r["old_time_travel_fails"]  # loud failure, not dangling read
    assert r["disk_matches_manifest"]  # no orphan dirs left


def test_zorder_balances_both_dims(spark):
    rows = {
        r["layout"]: r
        for r in registry.QUERIES["io_zorder_layout"](spark, SF).collect()
    }
    z, lin = rows["zorder"], rows["linear"]
    # z-order: SMALL coverage in both dims -> zone maps prune either way
    assert z["avg_cust_span"] < 0.3
    assert z["avg_day_span"] < 0.3
    # linear custkey layout: day dimension unclustered
    assert lin["avg_day_span"] > 0.7
    assert lin["avg_cust_span"] < z["avg_cust_span"]
    assert z["n_buckets"] == 64 and lin["n_buckets"] == 64


def test_column_stats_sanity(spark):
    rows = {
        r["column_name"]: r
        for r in registry.QUERIES["io_column_stats"](spark, SF).collect()
    }
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
    }
    ok = rows["o_orderkey"]
    assert ok["n_nulls"] == 0 and ok["ndv"] == ok["n"]  # unique key
    st = rows["o_orderstatus"]
    assert st["min_num"] is None and st["min_str"] is not None
    assert st["ndv"] <= 3


def test_skew_audit_consistency(spark):
    r = registry.QUERIES["io_partition_skew_audit"](spark, SF).collect()[0]
    assert r["n_keys"] > 0
    assert r["p50_rows"] <= r["p95_rows"] <= r["max_rows"]
    assert r["skew_ratio"] >= 1.0
    assert abs(r["skew_ratio"] - r["max_rows"] / r["avg_rows"]) < 1e-2
