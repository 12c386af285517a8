"""Wave 140 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_holm_monotone_and_null(spark):
    rows = registry.QUERIES["stat_holm_correction"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["p_holm"] >= r["p_raw"] - 1e-9  # adjustment never shrinks
        assert 0.0 <= r["p_holm"] <= 1.0
    # independent priorities: FWER control rejects nothing
    assert all(r["significant"] == 0 for r in rows)


def test_rbo_bounds(spark):
    r = registry.QUERIES["ml_rbo_topk"](spark, SF).collect()[0]
    assert r["k"] == 50
    assert 0.0 <= r["rbo"] <= 1.0
    assert 0.0 <= r["top10_overlap"] <= 1.0
    # correlated rankers (length vs tokens): well above random overlap
    assert r["rbo"] > 0.1
