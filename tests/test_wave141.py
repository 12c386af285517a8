"""Wave 141 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_time_in_state(spark):
    rows = registry.QUERIES["ev_time_in_state"](spark, SF).collect()
    assert len(rows) == 5
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 0.01
    for r in rows:
        assert r["intervals"] > 0
        assert r["hours_in_state"] > 0


def test_importance_weighted_eval(spark):
    r = registry.QUERIES["ml_importance_weighted_eval"](spark, SF).collect()[0]
    assert r["n"] == 500
    assert 0.0 <= r["accuracy"] <= 1.0
    assert 0.0 <= r["weighted_accuracy"] <= 1.0
    # uniform synthetic shift: the weighted metric barely moves
    assert r["gap"] < 0.1
