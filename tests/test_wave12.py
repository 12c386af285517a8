"""Wave 12 gates: sketch rank-error bound vs exact percentiles, the
no-cross-join interval decomposition, shard balance, and plan pins."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import count_shuffles, physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_quantile_sketch_within_rank_error(spark):
    """percentile_approx(acc=1000) guarantees rank error ≤ n/1000 ≈
    exact rank ± 0.1% — check value agreement through the exact
    quantiles at rank ± 1% for slack on the tiny test SF."""
    import duckdb

    approx = {
        r.event_type: (r.p50, r.p95, r.p99, r.n)
        for r in registry.QUERIES["sketch_quantile_rollup"](spark, SF).collect()
    }
    for et, (p50, p95, p99, n) in approx.items():
        for q, v in ((0.5, p50), (0.95, p95), (0.99, p99)):
            lo, hi = max(0.0, q - 0.01), min(1.0, q + 0.01)
            vlo, vhi = duckdb.sql(
                f"""SELECT quantile_cont(value, {lo}), quantile_cont(value, {hi})
                    FROM '{SF}/events.parquet' WHERE event_type = '{et}'"""
            ).fetchone()
            assert vlo - 1e-9 <= v <= vhi + 1e-9, (et, q, v, vlo, vhi)


def test_interval_overlap_has_no_cross_join(spark):
    plan = physical_plan(registry.QUERIES["j_interval_overlap"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shard_assign_is_balanced_and_total(spark):
    from mister_spark.operators.common import cat

    rows = registry.QUERIES["ds_shard_assign"](spark, SF).collect()
    n_docs = cat(spark, SF)["documents"].count()
    assert sum(r.n_docs for r in rows) == n_docs
    counts = [r.n_docs for r in rows]
    assert max(counts) <= 4 * max(1, min(counts)), counts


def test_seasonality_single_shuffle_and_one_peak(spark):
    df = registry.QUERIES["ev_seasonality"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        assert sum(r.is_peak for r in rs) == 1, et
        assert abs(sum(r.share for r in rs) - 1.0) < 0.01, et


def test_bot_detect_single_shuffle(spark):
    df = registry.QUERIES["ev_bot_detect"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)
