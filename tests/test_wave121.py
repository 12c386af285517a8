"""Wave 121 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_boundary_overlap_funnel(spark):
    r = registry.QUERIES["dd_boundary_overlap"](spark, SF).collect()[0]
    # fingerprint candidates bound the verified pairs; the integer
    # fingerprint has no collisions below the modulus on 3 tokens, but
    # the invariant must hold regardless
    assert 0 <= r["verified_pairs"] <= r["candidate_pairs"]
    assert r["docs_with_overlap"] <= r["verified_pairs"]
    # the shared-vocab corpus produces real boundary overlaps
    assert r["verified_pairs"] > 0


def test_core_decomposition(spark):
    rows = sorted(
        registry.QUERIES["graph_core_decomposition"](spark, SF).collect(),
        key=lambda r: r["core"],
    )
    assert rows
    total = sum(r["nodes"] for r in rows)
    assert total > 0
    # degeneracy bounded by the basket cap
    assert rows[-1]["core"] <= 16
    assert all(r["nodes"] > 0 for r in rows)


def test_partition_advisor(spark):
    rows = registry.QUERIES["io_partition_advisor"](spark, SF).collect()
    by = {r["table"]: r for r in rows}
    assert "_pipeline_total" in by
    total = by["_pipeline_total"]
    assert total["bytes"] == sum(
        r["bytes"] for r in rows if r["table"] != "_pipeline_total"
    )
    for r in rows:
        assert r["recommended_partitions"] >= 1
        assert r["configured_partitions"] >= 1
