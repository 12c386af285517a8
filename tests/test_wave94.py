"""Wave 94 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_kleinberg_states(spark):
    rows = registry.QUERIES["ev_kleinberg_bursts"](spark, SF).collect()
    assert len(rows) >= 25
    assert all(r["burst"] in (0, 1) for r in rows)
    assert all(r["lam1"] > r["lam0"] > 0 for r in rows)
    burst = [r["errors"] for r in rows if r["burst"] == 1]
    base = [r["errors"] for r in rows if r["burst"] == 0]
    if burst and base:
        # burst-state days must be louder on average than base days
        assert sum(burst) / len(burst) > sum(base) / len(base)


def test_dbscan_partitions_points(spark):
    rows = registry.QUERIES["ml_dbscan_grid"](spark, SF).collect()
    total = spark.read.parquet(f"{SF}/customer.parquet").count()
    noise = [r for r in rows if r["cluster"] == -1]
    assert len(noise) == 1
    clusters = [r for r in rows if r["cluster"] != -1]
    assert len(clusters) >= 1
    # top-10 clusters + noise cannot exceed the population; with few
    # clusters (the fixture case) they partition it exactly
    assert sum(r["size"] for r in rows) <= total
    assert all(r["size"] >= 1 for r in clusters)


def test_lorenz_curve_shape(spark):
    rows = sorted(
        registry.QUERIES["stat_lorenz_curve"](spark, SF).collect(),
        key=lambda r: r["pop_share"],
    )
    assert [r["pop_share"] for r in rows] == [
        round(0.1 * i, 1) for i in range(1, 11)
    ]
    shares = [r["spend_share"] for r in rows]
    assert shares == sorted(shares)  # monotone
    assert abs(shares[-1] - 1.0) < 1e-6  # full population holds all spend
    for r in rows:
        # ascending sort ⇒ Lorenz curve under the diagonal
        assert r["spend_share"] <= r["pop_share"] + 1e-9


def test_weighted_corr_bounds(spark):
    r = registry.QUERIES["stat_weighted_corr"](spark, SF).collect()[0]
    assert r["n"] > 0
    assert -1.0 <= r["weighted_corr"] <= 1.0
