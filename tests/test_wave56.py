"""Wave 56 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_stratified_att_weighting(spark):
    rows = registry.QUERIES["ev_stratified_att"](spark, SF).collect()
    assert rows
    atts = {r["att"] for r in rows}
    assert len(atts) == 1  # ATT column is the shared weighted sum
    att = atts.pop()
    # replay the treated-weighted mean of per-stratum diffs
    num = sum(r["n_treat"] * (r["y_treat"] - r["y_ctrl"]) for r in rows)
    den = sum(r["n_treat"] for r in rows)
    assert abs(att - num / den) < 0.01  # rounded-input slack
    for r in rows:
        assert r["n_treat"] > 0 and r["n_ctrl"] > 0


def test_hurst_in_range(spark):
    rows = registry.QUERIES["stat_hurst"](spark, SF).collect()
    assert len(rows) >= 2  # at least sizes 8 and 16 have full chunks
    hs = {r["hurst"] for r in rows}
    assert len(hs) == 1
    h = hs.pop()
    assert 0.0 < h < 1.2  # R/S estimates can mildly exceed 1 on tiny n
    for r in rows:
        assert r["mean_rs"] > 0
        assert r["n_chunks"] >= 1


def test_cluster_purity_bounds(spark):
    rows = registry.QUERIES["ml_cluster_purity"](spark, SF).collect()
    assert len(rows) == 10
    total = sum(r["n"] for r in rows)
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert total == n_vec  # every vector assigned exactly once
    for r in rows:
        assert 0.0 < r["purity"] <= 1.0
        assert 0 <= r["majority_label"] <= 9


def test_adstock_correlations_bounded(spark):
    r = registry.QUERIES["ev_adstock"](spark, SF).collect()[0]
    assert r["n_days"] > 10
    assert -1.0 <= r["corr_raw"] <= 1.0
    assert -1.0 <= r["corr_adstock"] <= 1.0
    assert r["lam"] == 0.6
