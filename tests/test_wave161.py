"""Wave 161 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_winsorized_mean(spark):
    r = registry.QUERIES["stat_winsorized_mean"](spark, SF).collect()[0]
    assert r["fence_lo"] < r["fence_hi"]
    # clamping/trimming a right-ish tail moves the mean, but not far
    for m in ("winsorized_mean", "trimmed_mean"):
        assert r["fence_lo"] <= r[m] <= r["fence_hi"]
        assert abs(r[m] - r["raw_mean"]) / r["raw_mean"] < 0.25


def test_changepoint(spark):
    r = registry.QUERIES["ev_changepoint_binseg"](spark, SF).collect()[0]
    assert len(r["split_day"]) == 10 and r["split_day"][4] == "-"
    assert r["left_mean"] > 0 and r["right_mean"] > 0
    # splitting can only reduce SSE
    assert 0 <= r["var_explained"] <= 1
