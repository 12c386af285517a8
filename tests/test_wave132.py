"""Wave 132 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_iv_recovers_effect(spark):
    r = registry.QUERIES["stat_iv_wald"](spark, SF).collect()[0]
    # true structural effect is 2 by construction
    assert abs(r["beta_iv"] - 2.0) < 0.2
    # the instrument is strong by construction: first-stage F >> 10
    assert r["first_stage_f"] > 10
    assert abs(r["first_stage_coef"] - 5.0) < 1.0


def test_scan_cost_model(spark):
    rows = registry.QUERIES["io_scan_cost_model"](spark, SF).collect()
    assert {r["table"] for r in rows} == {"lineitem", "orders", "events"}
    for r in rows:
        assert 0 < r["pruned_bytes"] <= r["full_bytes"]
        assert r["pruned_cost_microdollars"] <= r["full_cost_microdollars"]
        assert 0.0 <= r["savings_share"] < 1.0


def test_review_sample_strata(spark):
    rows = registry.QUERIES["ds_review_sample"](spark, SF).collect()
    strata = {}
    for r in rows:
        strata.setdefault((r["source"], r["bucket"]), []).append(r["doc_id"])
    # at most 2 docs per stratum, 20 sources x <=2 buckets
    assert all(len(v) <= 2 for v in strata.values())
    assert len({s for s, _ in strata}) == 20
    # deterministic: a second invocation returns the identical manifest
    again = {
        (r["source"], r["bucket"], r["doc_id"])
        for r in registry.QUERIES["ds_review_sample"](spark, SF).collect()
    }
    assert {(r["source"], r["bucket"], r["doc_id"]) for r in rows} == again
