"""Wave 151 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_clustered_write_audit(spark):
    rows = {r["layout"]: r for r in
            registry.QUERIES["io_clustered_write_audit"](spark, SF).collect()}
    assert set(rows) == {"sorted", "unsorted"}
    # sorted/clustered files: tight disjoint spans
    assert rows["sorted"]["mean_span_fraction"] < \
        rows["unsorted"]["mean_span_fraction"]
    assert rows["sorted"]["overlapping_pairs"] == 0
    assert rows["unsorted"]["overlapping_pairs"] > 0


def test_quantization_sweep(spark):
    rows = sorted(
        registry.QUERIES["ml_quantization_sweep"](spark, SF).collect(),
        key=lambda r: -r["bits"],
    )
    assert [r["bits"] for r in rows] == [8, 4, 2]
    dist = [r["mean_cosine_distortion"] for r in rows]
    # fewer bits, more distortion
    assert dist == sorted(dist)
    # 8-bit is near-lossless for neighbor retrieval
    assert rows[0]["top10_overlap"] >= 0.9
    # 2-bit degrades badly — the measured cliff
    assert rows[-1]["top10_overlap"] <= rows[0]["top10_overlap"]


def test_kendall_w(spark):
    r = registry.QUERIES["stat_kendall_w"](spark, SF).collect()[0]
    assert r["docs"] == 500
    assert 0.0 <= r["kendall_w"] <= 1.0
