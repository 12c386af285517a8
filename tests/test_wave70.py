"""Wave 70 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_accumulators_agree_with_declarative(spark):
    r = registry.QUERIES["mr_accumulators"](spark, SF).collect()[0]
    assert r["counters_agree"] == 1
    assert r["n_big"] <= r["n_rows"]
    assert r["n_finished"] <= r["n_rows"]


def test_bootstrap_diff_ci_brackets(spark):
    r = registry.QUERIES["ml_bootstrap_diff_ci"](spark, SF).collect()[0]
    assert r["boot_se"] > 0
    assert r["ci_lo"] < r["ci_hi"]
    # identically-distributed groups: CI must include zero
    assert r["ci_lo"] <= 0.0 <= r["ci_hi"]


def test_modified_after_skips_old_files(spark):
    r = registry.QUERIES["io_modified_after_scan"](spark, SF).collect()[0]
    assert r["skipped_old"] == 1
    assert r["n_after_cutoff"] + r["n_old"] == r["n_total"]


def test_conformal_coverage_near_target(spark):
    r = registry.QUERIES["ml_conformal_interval"](spark, SF).collect()[0]
    assert r["n_test"] > 0
    assert r["qhat"] > 0
    # 80% nominal; tiny test sets wobble, so gate generously
    assert 0.4 <= r["coverage"] <= 1.0
