"""Wave 116 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_xicor_bounds(spark):
    r = registry.QUERIES["stat_xicor"](spark, SF).collect()[0]
    assert r["n"] > 0
    # xi lives in roughly [-0.5, 1]; for small-n noise keep it loose
    assert -0.6 <= r["xi"] <= 1.0


def test_runtime_metrics(spark):
    r = registry.QUERIES["io_runtime_metrics"](spark, SF).collect()[0]
    assert r["probe_rows"] == 1500
    assert r["default_parallelism"] >= 1
    assert r["shuffle_partitions"] >= 1
    assert r["aqe"] in ("true", "false")
    assert r["executor_mem_entries"] >= 1


def test_attribution_window_monotone(spark):
    rows = sorted(
        registry.QUERIES["ev_attribution_window_sweep"](spark, SF).collect(),
        key=lambda r: r["window_hours"],
    )
    assert [r["window_hours"] for r in rows] == [24, 72, 168]
    attr = [r["attributed"] for r in rows]
    # wider windows can only attribute more
    assert attr == sorted(attr)
    for r in rows:
        assert 0 <= r["attributed"] <= r["clicks"]
        assert 0.0 <= r["conv_rate"] <= 1.0
