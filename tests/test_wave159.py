"""Wave 159 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_heaps_law(spark):
    r = registry.QUERIES["tx_heaps_law"](spark, SF).collect()[0]
    # trigram vocabulary grows sublinearly but far from saturated
    assert 0.5 < r["heaps_beta"] < 1.0
    assert r["heaps_k"] > 0
    assert r["checkpoints"] == 10


def test_soft_dedup(spark):
    r = registry.QUERIES["dd_soft_dedup"](spark, SF).collect()[0]
    assert r["total_docs"] == 500
    assert 0 < r["clusters"] <= r["total_docs"]
    assert abs(r["effective_fraction"] - r["clusters"] / r["total_docs"]) < 1e-3
    # template prefixes do collide in this corpus
    assert r["max_cluster"] >= 2
    assert r["docs_in_dup_clusters"] >= r["max_cluster"]
