"""Wave 160 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_interval_union(spark):
    r = registry.QUERIES["j_interval_union"](spark, SF).collect()[0]
    assert r["suppliers"] > 0
    # union never exceeds the naive sum; overlaps exist, so strictly less
    assert 0 < r["avg_busy_days"] <= r["avg_naive_days"]
    assert 0 < r["compression"] < 1
    assert r["max_busy_days"] >= r["avg_busy_days"]


def test_jarque_bera(spark):
    r = registry.QUERIES["stat_jarque_bera"](spark, SF).collect()[0]
    # log order prices are left-skewed, platykurtic, and decisively
    # non-normal at this n
    assert r["jb_stat"] > 0
    assert 0 <= r["p_value"] <= 1
    assert r["reject_normality"] == 1
    assert abs(r["skewness"]) < 5 and 1 < r["kurtosis"] < 10
