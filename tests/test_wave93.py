"""Wave 93 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_spatial_grid_join_counts(spark):
    r = registry.QUERIES["j_spatial_grid_join"](spark, SF).collect()[0]
    # candidates bound the matches, and the cell prune must actually
    # prune: matches ≤ candidates
    assert 0 <= r["matched_pairs"] <= r["candidate_pairs"]
    if r["matched_pairs"]:
        assert 0 < r["avg_dist"] <= 0.5


def test_spatial_candidates_complete(spark):
    """Cell join with 3x3 expansion must find every true pair: verify
    against the O(n²) reference on the small fixture."""
    import itertools

    from mister_spark.operators.extras93 import RADIUS, _points

    pts = _points(spark, SF).collect()
    truth = 0
    for a, b in itertools.combinations(pts, 2):
        d2 = (a["lat"] - b["lat"]) ** 2 + (a["lon"] - b["lon"]) ** 2
        if d2 <= RADIUS**2:
            truth += 1
    r = registry.QUERIES["j_spatial_grid_join"](spark, SF).collect()[0]
    assert r["matched_pairs"] == truth


def test_moran_i_near_null(spark):
    r = registry.QUERIES["stat_moran_i"](spark, SF).collect()[0]
    assert r["links"] > 0
    # hash-synthesized coordinates carry no spatial structure: I must
    # sit near E[I] = -1/(n-1), far from ±1
    assert abs(r["moran_i"]) < 0.5
    assert -0.05 < r["expected_i"] < 0


def test_als_rmse_decreases(spark):
    rows = sorted(
        registry.QUERIES["ml_als_factorization"](spark, SF).collect(),
        key=lambda r: r["iteration"],
    )
    assert [r["iteration"] for r in rows] == [1, 2, 3]
    rmses = [r["rmse"] for r in rows]
    for a, b in zip(rmses, rmses[1:]):
        assert b <= a + 1e-9  # ALS is monotone on the training objective
    # and it must beat the predict-zero baseline decisively
    assert rmses[-1] < rows[0]["baseline_rmse"] * 0.7
