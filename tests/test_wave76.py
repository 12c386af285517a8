"""Wave 76 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_moments_merge_agrees(spark):
    r = registry.QUERIES["sketch_moments_merge"](spark, SF).collect()[0]
    assert r["merge_agrees"] == 1
    assert r["n"] > 0 and r["var_pop"] > 0


def test_error_slices_accounting(spark):
    rows = registry.QUERIES["ml_error_slices"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["acc"] <= 1.0
        assert r["significant"] in (0, 1)
    total = sum(r["n"] for r in rows)
    assert total == 500


def test_label_propagation_communities(spark):
    rows = registry.QUERIES["graph_label_propagation"](spark, SF).collect()
    assert rows
    sizes = [r["size"] for r in rows]
    assert sorted(sizes, reverse=True) == sizes
    shares = {r["internal_edge_share"] for r in rows}
    assert len(shares) == 1
    s = shares.pop()
    assert 0.0 < s <= 1.0
    for r in rows:
        assert r["size"] >= 1


def test_lineage_mask_consistency(spark):
    rows = registry.QUERIES["ds_lineage_manifest"](spark, SF).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    assert total == 500
    for r in rows:
        assert 0 <= r["lineage_mask"] <= 7
        # kept iff all three gate bits set
        assert r["kept"] == (1 if r["lineage_mask"] == 7 else 0)
