"""Wave 64 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_interrupted_ts_consistency(spark):
    r = registry.QUERIES["ev_interrupted_ts"](spark, SF).collect()[0]
    assert r["n_pre"] > 0 and r["n_post"] > 0
    assert abs(r["slope_change"] - (r["slope_post"] - r["slope_pre"])) < 1e-3


def test_k_anonymity_accounting(spark):
    r = registry.QUERIES["ds_k_anonymity"](spark, SF).collect()[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r["n_rows"] == n_docs
    assert r["n_small"] <= r["n_groups"]
    assert r["n_risky_rows"] <= r["n_rows"]
    # generalizing can only grow the minimum group size
    assert r["min_group_generalized"] >= r["min_group"]
    if r["k_anonymous"] == 1:
        assert r["k_anon_after_drop"] == 1


def test_cronbach_alpha_range(spark):
    r = registry.QUERIES["stat_cronbach_alpha"](spark, SF).collect()[0]
    assert r["k_items"] == 8
    # alpha <= 1 always; near-independent dims give alpha near 0
    assert -2.0 <= r["alpha"] <= 1.0


def test_ranker_agreement_bounds(spark):
    rows = registry.QUERIES["ml_ranker_agreement"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["overlap_at_k"] <= 1.0
        assert r["n_common"] <= 10
        assert -1.0 <= r["spearman_common"] <= 1.0
        assert abs(r["overlap_at_k"] - r["n_common"] / 10) < 1e-6
