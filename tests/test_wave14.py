"""Wave 14 gates: recursion semantics, patch-grid shape/determinism,
nearest-join plan shape, and kNN sanity."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_recursive_schedule_compounds_correctly(spark):
    """Every month-m balance must equal rnd(prev * 1.01 + 100, 2) —
    checks the recursion actually chains rows, not just unions."""
    rows = registry.QUERIES["sql_recursive"](spark, SF).collect()
    by_nation: dict[int, dict[int, float]] = {}
    for r in rows:
        by_nation.setdefault(r.n_nationkey, {})[r.month] = r.balance
    assert by_nation
    import math

    for nk, months in by_nation.items():
        assert sorted(months) == list(range(13)), nk
        for m in range(1, 13):
            want = math.floor((months[m - 1] * 1.01 + 100) * 100 + 0.5) / 100
            assert abs(months[m] - want) < 1e-9, (nk, m, months[m], want)


def test_patch_grid_shape_and_determinism(spark):
    from mister_spark.operators.common import cat
    from mister_spark.operators.extras14 import PATCH_GRID

    df = registry.QUERIES["mm_patch_grid"](spark, SF)
    n_docs = cat(spark, SF)["documents"].count()
    rows = df.collect()
    assert len(rows) == n_docs * PATCH_GRID * PATCH_GRID
    # deterministic across runs
    again = set(map(tuple, registry.QUERIES["mm_patch_grid"](spark, SF).collect()))
    assert set(map(tuple, rows)) == again
    for r in rows[:64]:
        assert 0 <= r.p_row < PATCH_GRID and 0 <= r.p_col < PATCH_GRID
        assert r.x0 == r.p_col * r.pw and r.y0 == r.p_row * r.ph


def test_asof_nearest_no_cross_join(spark):
    plan = physical_plan(registry.QUERIES["ev_asof_nearest"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_covers_whole_holdout(spark):
    from mister_spark.operators.common import cat
    from pyspark.sql import functions as F

    emb = cat(spark, SF)["embeddings"]
    n_test = emb.filter(F.col("vec_id") % 5 == 0).count()
    got = registry.QUERIES["ml_knn_classify"](spark, SF).collect()
    assert len(got) == n_test
    assert len({r.vec_id for r in got}) == n_test
