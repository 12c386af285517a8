"""Wave 83 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_kruskal_wallis_stat(spark):
    r = registry.QUERIES["stat_kruskal_wallis"](spark, SF).collect()[0]
    assert r["dof"] == 4  # 5 order priorities
    assert r["h"] >= 0.0
    # ε² is H/(n−1), bounded by [0, 1]
    assert 0.0 <= r["eps_sq"] <= 1.0
    # priorities are assigned independently of totalprice → H should be
    # far below the ~18.5 (p≈0.001, df=4) significance region
    assert r["h"] < 18.5


def test_rrf_fusion_top20(spark):
    rows = registry.QUERIES["ml_rrf_fusion"](spark, SF).collect()
    assert len(rows) == 20
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # rrf of ranks (1,1) is the max achievable
    assert scores[0] <= 2.0 / 61 + 1e-9
    for r in rows:
        assert r["r_chars"] >= 1 and r["r_tokens"] >= 1


def test_kde_density_integrates(spark):
    rows = registry.QUERIES["stat_kde"](spark, SF).collect()
    assert len(rows) == 21
    xs = sorted(r["grid_x"] for r in rows)
    assert xs[0] < xs[-1]
    # trapezoid integral of the density over the grid ≈ mass inside
    # [min, max]; Gaussian tails leak some mass, so expect 0.6–1.05
    step = (xs[-1] - xs[0]) / 20
    dens = [r["density_ppm"] / 1e6 for r in sorted(rows, key=lambda r: r["i"])]
    integral = sum(
        (dens[i] + dens[i + 1]) / 2 * step for i in range(len(dens) - 1)
    )
    assert 0.6 <= integral <= 1.05, integral


def test_modularity_bounds(spark):
    r = registry.QUERIES["graph_modularity"](spark, SF).collect()[0]
    assert r["communities"] >= 2
    # Q ∈ [−0.5, 1] by construction
    assert -0.5 <= r["q"] <= 1.0
