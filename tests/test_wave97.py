"""Wave 97 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_rag_self_retrieval(spark):
    r = registry.QUERIES["ds_rag_eval"](spark, SF).collect()[0]
    assert r["n_queries"] >= 10
    # bigram prefix queries must retrieve their donor near-perfectly
    assert r["hit_at_k"] >= 0.9
    assert 0.5 <= r["mrr"] <= 1.0
    assert r["mrr"] <= r["hit_at_k"] + 1e-9


def test_beta_binomial_fit(spark):
    r = registry.QUERIES["stat_beta_binomial"](spark, SF).collect()[0]
    assert r["sources"] == 20
    assert 0.0 < r["mean_rate"] < 1.0
    assert r["icc"] >= 0.0001
    assert r["alpha"] > 0 and r["beta"] > 0
    # alpha/(alpha+beta) must reproduce the mean rate
    assert abs(r["alpha"] / (r["alpha"] + r["beta"]) - r["mean_rate"]) < 0.01


def test_learning_curve_fractions(spark):
    rows = sorted(
        registry.QUERIES["ml_learning_curve"](spark, SF).collect(),
        key=lambda r: r["fraction"],
    )
    assert [r["fraction"] for r in rows] == [0.25, 0.5, 1.0]
    ns = [r["n"] for r in rows]
    assert ns[0] < ns[1] < ns[2]
    for r in rows:
        # trained log-loss must at least beat the chance floor ln 2
        assert 0.0 < r["final_loss"] < 0.6932
