"""Wave 136 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cka(spark):
    r = registry.QUERIES["ml_cka"](spark, SF).collect()[0]
    assert r["n"] == 500 and r["half_dim"] == 32
    # a representation is perfectly aligned with itself
    assert abs(r["cka_self"] - 1.0) < 1e-6
    # independent halves: CKA near zero
    assert 0.0 <= r["cka_between"] < 0.3


def test_commit_protocol_audit(spark):
    r = registry.QUERIES["io_commit_protocol_audit"](spark, SF).collect()[0]
    assert r["has_success"] == 1
    assert r["temp_dirs"] == 0
    assert r["valid_footers"] == r["part_files"] >= 1
    assert r["consistent"] == 1


def test_stream_health(spark):
    r = registry.QUERIES["ev_stream_health"](spark, SF).collect()[0]
    assert r["active_days"] > 0
    assert r["span_days"] >= r["active_days"]
    assert r["gap_days"] == r["span_days"] - r["active_days"]
    assert r["dup_ids"] == 0  # clean synthetic feed, proven
    assert r["day_volume_cv"] >= 0
