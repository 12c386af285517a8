"""Wave 172 behavior gates (ev_msprt parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_msprt_always_valid_properties(spark):
    from mister_spark.operators.extras172 import MSPRT_LOOKS

    rows = registry.QUERIES["ev_msprt"](spark, SF).collect()
    assert len(rows) == MSPRT_LOOKS
    # A/A: the boundary must never fire
    assert all(r["crossed"] == 0 for r in rows)
    # always-valid p is a running minimum, capped at 1
    ps = [r["p_always_valid"] for r in rows]
    assert all(p2 <= p1 for p1, p2 in zip(ps, ps[1:]))
    assert all(0 < p <= 1 for p in ps)
    # looks accumulate the whole stream
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns)


def test_iceberg_expire_audit(spark):
    r = registry.QUERIES["io_iceberg_expire"](spark, SF).collect()[0]
    assert r["expired"] == 1 and r["kept"] == 2
    assert r["current_unchanged"] == 1
    assert r["head_stable"] == 1
    assert r["expired_unreadable"] == 1
    assert r["kept_readable"] == 1
    # metadata evolved: old file logged, at least the expired manifest
    # list physically deleted
    assert r["metadata_log_len"] == 1
    assert r["deleted_files"] >= 1
