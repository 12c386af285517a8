"""Wave 134 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_variance_components(spark):
    r = registry.QUERIES["stat_variance_components"](spark, SF).collect()[0]
    assert r["customers"] > 0 and r["orders"] > r["customers"]
    assert r["ms_within_m"] > 0
    assert 0.0 <= r["icc"] <= 1.0
    # customer-independent order values → ICC near zero
    assert r["icc"] < 0.2


def test_rebalance_plan(spark):
    rows = registry.QUERIES["ds_rebalance_plan"](spark, SF).collect()
    before = rows[0]["imbalance_before"]
    after = rows[0]["imbalance_after"]
    assert before >= 1.0
    assert after <= before + 1e-9  # the plan never worsens balance
    for r in rows:
        if r["from_shard"] >= 0:
            assert r["tokens_moved"] >= 0
            assert r["from_shard"] != r["to_shard"]


def test_embedding_isotropy(spark):
    r = registry.QUERIES["ml_embedding_isotropy"](spark, SF).collect()[0]
    assert r["dim"] == 64
    assert 1.0 / 64 <= r["top_eig_share"] < 1.0
    assert 1.0 <= r["effective_rank"] <= 64.0
    assert 0.0 <= r["isotropy_ratio"] <= 1.0
    # near-isotropic synthetic embeddings: effective rank close to d
    assert r["effective_rank"] > 40
