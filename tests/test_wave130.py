"""Wave 130 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_sequential_patterns(spark):
    rows = registry.QUERIES["ev_sequential_patterns"](spark, SF).collect()
    assert len(rows) == 20  # 5 types, ordered pairs
    by = {(r["antecedent"], r["consequent"]): r for r in rows}
    for r in rows:
        assert r["support_sessions"] > 0
        assert r["lift"] > 0
    # a→b and b→a are tracked separately (direction matters)
    assert ("view", "purchase") in by and ("purchase", "view") in by


def test_fisher_combined(spark):
    r = registry.QUERIES["stat_fisher_combined"](spark, SF).collect()[0]
    assert r["strata"] == 7
    assert r["fisher_stat"] >= 0
    assert 0.0 <= r["p_combined"] <= 1.0


def test_degenerate_docs_clean(spark):
    r = registry.QUERIES["tx_degenerate_docs"](spark, SF).collect()[0]
    assert r["total_docs"] > 0
    # the synthetic corpus is degenerate-free; the census must prove it
    assert r["empty_docs"] == 0
    assert r["single_type_docs"] == 0
    assert r["low_entropy_docs"] == 0
