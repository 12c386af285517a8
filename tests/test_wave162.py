"""Wave 162 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_stickiness(spark):
    rows = registry.QUERIES["ev_stickiness"](spark, SF).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["avg_dau"] <= r["mau"]
        assert 0 < r["stickiness"] <= 1


def test_chauvenet(spark):
    r = registry.QUERIES["stat_chauvenet"](spark, SF).collect()[0]
    assert r["days"] > 0
    assert 0 <= r["outlier_days"] < r["days"]
    assert r["max_abs_z"] > 0
    assert r["min_expected"] >= 0
