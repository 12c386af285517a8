"""Wave 125 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_erlang_c_curve(spark):
    rows = sorted(
        registry.QUERIES["ev_erlang_c"](spark, SF).collect(),
        key=lambda r: r["servers"],
    )
    assert [r["servers"] for r in rows] == [1, 2, 3, 4, 6, 8]
    pw = [r["p_wait"] for r in rows]
    # more servers can only reduce waiting probability
    for a, b in zip(pw, pw[1:]):
        assert b <= a + 1e-9
    for r in rows:
        assert 0.0 <= r["p_wait"] <= 1.0
        if r["utilization"] < 1:
            assert r["avg_wait_minutes"] >= 0


def test_quality_length_mi(spark):
    r = registry.QUERIES["ds_quality_length_mi"](spark, SF).collect()[0]
    assert r["docs"] > 0
    # MI is non-negative and bounded by ln(bins)
    assert 0.0 <= r["mutual_information"] <= 1.3863


def test_nested_pruning(spark):
    rows = registry.QUERIES["io_nested_pruning"](spark, SF).collect()
    assert len(rows) == 5
    assert sum(r["n"] for r in rows) == 1500
    # the scan must prune the struct to the one read subfield
    assert all(r["schema_pruned"] == 1 for r in rows)
