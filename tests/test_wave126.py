"""Wave 126 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ratio_metric_ci(spark):
    r = registry.QUERIES["stat_ratio_metric_se"](spark, SF).collect()[0]
    assert r["customers"] > 0
    assert r["delta_se"] > 0
    assert r["ci_lo"] < r["revenue_per_order"] < r["ci_hi"]


def test_c2st_null(spark):
    r = registry.QUERIES["ml_c2st"](spark, SF).collect()[0]
    assert r["n"] == 250
    assert r["null_lo"] < 0.5 < r["null_hi"]
    # exchangeable halves: held-out accuracy inside the null band
    assert r["drift_detected"] == 0
    assert r["null_lo"] - 0.05 <= r["accuracy"] <= r["null_hi"] + 0.05


def test_catalog_turnover_identity(spark):
    r = registry.QUERIES["ev_catalog_turnover"](spark, SF).collect()[0]
    assert r["parts_both"] <= min(r["parts_before"], r["parts_after"])
    assert r["newcomers"] == r["parts_after"] - r["parts_both"]
    assert r["dropouts"] == r["parts_before"] - r["parts_both"]
    assert 0.0 <= r["jaccard"] <= 1.0
