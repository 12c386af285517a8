"""Wave 103 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_raking_margins_converge(spark):
    rows = registry.QUERIES["stat_raking_ipf"](spark, SF).collect()
    assert len(rows) == 7
    for r in rows:
        # after 5 IPF rounds the weekday margin must hit the target
        assert abs(r["weighted_share"] - r["target_share"]) <= 2e-4
        assert r["weight_spread"] >= 1.0
    # weights actually moved (raw margins weren't uniform)
    assert rows[0]["weight_spread"] > 1.01


def test_fleiss_kappa_near_zero(spark):
    r = registry.QUERIES["stat_fleiss_kappa"](spark, SF).collect()[0]
    assert r["items"] == 500
    assert 0.0 <= r["p_observed"] <= 1.0
    assert 0.0 < r["p_expected"] < 1.0
    # independent raters → kappa near 0
    assert abs(r["fleiss_kappa"]) < 0.15


def test_aspect_buckets_partition(spark):
    rows = registry.QUERIES["mm_aspect_buckets"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == docs
    for r in rows:
        assert 0.0 <= r["avg_padding_waste"] <= r["max_padding_waste"] <= 1.0
    # nearest-bucket routing: average waste must be modest
    weighted = sum(r["avg_padding_waste"] * r["n"] for r in rows) / docs
    assert weighted < 0.25
