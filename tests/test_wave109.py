"""Wave 109 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras109 import RIDGE_LAMBDAS, WALKS_PER_NODE

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ridge_path_shrinks(spark):
    rows = sorted(
        registry.QUERIES["ml_ridge_path"](spark, SF).collect(),
        key=lambda r: r["lam"],
    )
    assert [r["lam"] for r in rows] == list(RIDGE_LAMBDAS)
    norms = [r["coef_norm"] for r in rows]
    # ridge shrinks monotonically with lambda
    for a, b in zip(norms, norms[1:]):
        assert b <= a + 1e-9
    dfs = [r["eff_df"] for r in rows]
    for a, b in zip(dfs, dfs[1:]):
        assert b <= a + 1e-9
    assert rows[0]["gcv_rel"] == 1.0


def test_random_walks_cover(spark):
    r = registry.QUERIES["graph_random_walks"](spark, SF).collect()[0]
    assert r["walks"] == r["nodes"] * WALKS_PER_NODE
    assert 0 < r["covered_nodes"] <= r["nodes"]
    assert r["coverage"] > 0.5  # walks must actually move around
    assert 1.0 <= r["avg_unique_per_walk"] <= r["walk_len"] + 1


def test_forecast_ensemble(spark):
    rows = {r["model"]: r for r in
            registry.QUERIES["ev_forecast_ensemble"](spark, SF).collect()}
    assert set(rows) == {"naive", "snaive7", "drift", "ensemble"}
    singles = [rows[m]["mae"] for m in ("naive", "snaive7", "drift")]
    # the combination must beat the AVERAGE single model (the classic
    # forecast-combination guarantee under diversification)
    assert rows["ensemble"]["mae"] <= sum(singles) / 3 + 1e-9
    wsum = sum(rows[m]["weight"] for m in ("naive", "snaive7", "drift"))
    assert abs(wsum - 1.0) < 0.01


def test_nested_f_test(spark):
    r = registry.QUERIES["stat_nested_f_test"](spark, SF).collect()[0]
    assert r["df1"] == 1
    assert r["df2"] > 100
    assert r["f_stat"] >= 0
    # the full model can only fit at least as well
    assert r["r2_full"] >= r["r2_small"] - 1e-9
