"""Wave 149 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_multinomial_ci(spark):
    rows = registry.QUERIES["stat_multinomial_ci"](spark, SF).collect()
    assert len(rows) == 5
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 0.01
    for r in rows:
        assert r["ci_lo"] <= r["share"] <= r["ci_hi"]
        # uniform design: every interval covers 0.2
        assert r["ci_lo"] <= 0.2 <= r["ci_hi"]


def test_edge_surprise(spark):
    rows = registry.QUERIES["graph_edge_surprise"](spark, SF).collect()
    assert len(rows) == 15
    vals = [r["surprise"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["weight"] >= 3  # support threshold
        assert r["expected_weight"] > 0
        # top-surprise edges exceed the popularity expectation
        assert r["surprise"] > 1.0
