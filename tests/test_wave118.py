"""Wave 118 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_maxstat_cutpoint(spark):
    r = registry.QUERIES["stat_maxstat_cutpoint"](spark, SF).collect()[0]
    assert r["n_left"] >= 30 and r["n_right"] >= 30
    assert r["candidates"] > 50
    assert r["max_t"] > 0
    # segment is balance-independent: even the MAX over candidates
    # should stay below an extreme bar
    assert r["max_t"] < 6.0


def test_group_sequential_aa(spark):
    rows = sorted(
        registry.QUERIES["stat_group_sequential"](spark, SF).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in rows] == [1, 2, 3, 4]
    ns = [r["n_cum"] for r in rows]
    assert ns == sorted(ns)  # cumulative
    bounds = [r["obf_boundary"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)  # OBF shrinks
    # A/A: no look may cross its boundary
    assert all(r["crossed"] == 0 for r in rows)


def test_from_csv_roundtrip(spark):
    rows = registry.QUERIES["sql_from_csv_roundtrip"](spark, SF).collect()
    assert len(rows) == 5
    assert sum(r["n"] for r in rows) == 1500
