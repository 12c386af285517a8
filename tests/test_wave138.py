"""Wave 138 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pack_boundary_waste(spark):
    r = registry.QUERIES["ds_pack_boundary_waste"](spark, SF).collect()[0]
    assert r["sequences"] > 0
    assert 0.0 <= r["avg_cross_doc_pair_share"] <= 1.0
    assert 0.0 <= r["pure_seq_share"] <= 1.0
    # ~50-token docs in 2048-token sequences: contamination is severe
    assert r["avg_cross_doc_pair_share"] > 0.8
    assert r["avg_docs_per_seq"] > 5


def test_bic_bayes_factor_supports_null(spark):
    r = registry.QUERIES["stat_bic_bayes_factor"](spark, SF).collect()[0]
    # priority-independent prices: evidence must favor the null
    assert r["log_bf10"] < 0
    assert 0.0 < r["bf10_capped"] < 1.0
    assert r["substantial_evidence"] == 0
