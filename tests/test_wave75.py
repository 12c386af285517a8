"""Wave 75 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_rdd_reports_tight_null(spark):
    r = registry.QUERIES["stat_regression_discontinuity"](spark, SF).collect()[0]
    assert r["n_left"] > 50 and r["n_right"] > 50
    # no threshold rule exists in the synthetic data: placebo discipline
    assert abs(r["rdd_effect"]) < 0.25
    assert abs(r["rdd_effect"] - (r["y_right"] - r["y_left"])) < 1e-3


def test_checkpoint_resume_is_exactly_once(spark):
    r = registry.QUERIES["stream_checkpoint_resume"](spark, SF).collect()[0]
    assert r["exactly_once"] == 1
    assert r["first_run_rows"] == r["n_events"]
    assert r["second_run_rows"] == 0


def test_capacity_plan_order(spark):
    r = registry.QUERIES["ev_capacity_plan"](spark, SF).collect()[0]
    assert r["n_hours"] > 100
    assert r["p50"] <= r["p95"] <= r["p99"] <= r["peak"]
    assert r["provision_for"] >= r["p99"]
