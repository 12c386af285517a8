"""Wave 39 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_user_split_no_leakage(spark):
    """Every user lands in exactly one split (entity-level split), and
    the 8/1/1 proportions hold roughly on users."""
    import duckdb

    rows = {r["split"]: r for r in registry.QUERIES["ds_user_split"](spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    total_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    # disjointness: per-split distinct users sum to the global count
    assert sum(r["n_users"] for r in rows.values()) == total_users
    assert rows["train"]["n_users"] > rows["val"]["n_users"]
    assert rows["train"]["n_users"] > rows["test"]["n_users"]


def test_pack_efficiency_ordering(spark):
    """Packed layout never uses more slots than naive padding, and
    utilization numbers are consistent with the slot counts."""
    r = registry.QUERIES["ds_pack_efficiency"](spark, SF).collect()[0]
    assert r["packed_slots"] <= r["naive_slots"]
    assert r["total_tokens"] <= r["packed_slots"]
    assert 0 < r["naive_util"] <= r["packed_util"] <= 1.0


def test_psi_drift_near_zero_on_interleaved_halves(spark):
    """Even/odd vec_id halves come from the same distribution, so PSI
    stays under the 0.25 retrain threshold (sf0.001 has only a few
    hundred vectors, so per-dim sampling noise can push past the 0.1
    'investigate' line) and is nonnegative by construction."""
    rows = registry.QUERIES["ml_psi_drift"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_ref"] > 0 and r["n_cur"] > 0
        assert 0 <= r["psi"] < 0.25


def test_simpson_diversity_bounds(spark):
    """Indices live in their theoretical ranges: ttr, simpson in
    (0, 1]; shannon in [0, ln(n_types)]."""
    import math

    rows = registry.QUERIES["tx_simpson_diversity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["ttr"] <= 1
        assert 0 <= r["simpson"] <= 1
        assert -1e-9 <= r["shannon"] <= math.log(r["n_types"]) + 1e-6
