"""Wave 79 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_growth_ledger_identity(spark):
    r = registry.QUERIES["ev_growth_accounting"](spark, SF).collect()[0]
    assert r["active_p1"] == r["retained"] + r["new_users"]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["retained"] + r["new_users"] + r["churned"] <= n_users
    assert r["quick_ratio"] >= 0


def test_aqe_actually_coalesces(spark):
    r = registry.QUERIES["io_aqe_coalesce"](spark, SF).collect()[0]
    assert r["aqe_enabled"] == 1
    assert r["coalesced"] == 1
    assert r["runtime_partitions"] < r["configured_partitions"]


def test_ks_bounds(spark):
    r = registry.QUERIES["ml_ks_discrimination"](spark, SF).collect()[0]
    assert r["n_pos"] + r["n_neg"] == 500
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert 0 <= r["ks_bin"] <= 49
