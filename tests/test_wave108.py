"""Wave 108 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_var_model_rows(spark):
    rows = {r["equation"]: r for r in
            registry.QUERIES["ev_var_model"](spark, SF).collect()}
    assert set(rows) == {"click", "view"}
    for r in rows.values():
        # stationary count series: lag coefficients inside unit region
        assert abs(r["coef_lag_click"]) < 1.5
        assert abs(r["coef_lag_view"]) < 1.5
        assert r["intercept"] == r["intercept"]  # not NaN


def test_doubly_robust_recovers_truth(spark):
    r = registry.QUERIES["ml_doubly_robust"](spark, SF).collect()[0]
    # with 15 users the fixture is too small for a strict naive-vs-DR
    # ordering; pin that both corrected estimators land near truth
    # (the exact arithmetic is oracle-checked at both scales)
    assert abs(r["dr"] - r["true_mean"]) / r["true_mean"] < 0.2
    assert abs(r["ipw"] - r["true_mean"]) / r["true_mean"] < 0.2
    assert r["naive"] > 0


def test_filter_disagreement_partition(spark):
    r = registry.QUERIES["ds_filter_disagreement"](spark, SF).collect()[0]
    total = r["both_pass"] + r["only_a"] + r["only_b"] + r["neither"]
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == docs
    assert 0.0 <= r["jaccard"] <= 1.0
