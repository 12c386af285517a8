"""Wave 29 behavior/plan gates (oracle parity is in test_oracle_parity):
zone-map pushdown, null-trap semantics, rolling-slope window shape."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import count_shuffles, physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_zone_map_prune_pushes_range_filter(spark):
    """The shipdate band must reach the clustered scan as PushedFilters
    (row-group stats skipping is footer-driven, so the predicate has to
    arrive at the source, not a post-scan Filter)."""
    df = registry.QUERIES["io_zone_map_prune"](spark, SF)
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_shipdate" in plan, plan


def test_not_in_trap_fires(spark):
    """The testdata has 'P'-status urgent orders, so the NULL actually
    lands in the subquery: NOT IN must collapse to 0 while NOT EXISTS
    counts real non-buyers."""
    row = registry.QUERIES["sq_not_in_null_trap"](spark, SF).collect()[0]
    assert row["has_null"] == 1
    assert row["n_not_in"] == 0
    assert row["n_not_exists"] > 0


def test_rolling_slope_windows_are_partitioned(spark):
    """The RANGE windows run partitioned by event_type (no global sort)
    and slope is null exactly when the trailing frame has <2 points."""
    df = registry.QUERIES["ev_rolling_slope"](spark, SF)
    plan = physical_plan(df)
    assert "hashpartitioning(event_type" in plan, plan
    rows = df.collect()
    assert rows
    # days are distinct within a type, so var_x > 0 whenever n >= 2:
    # slope is null exactly on 1-point frames
    for r in rows:
        assert (r["slope"] is None) == (r["n_days"] < 2)


def test_source_vocab_overlap_bounds(spark):
    """Jaccard in [0,1]; intersection never exceeds either vocabulary;
    every pair ordered a < b and unique."""
    rows = registry.QUERIES["tx_source_vocab_overlap"](spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["inter"] <= min(r["vocab_a"], r["vocab_b"])
        assert 0.0 <= r["jaccard"] <= 1.0
