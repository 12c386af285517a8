"""Wave 52 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras52 import BT_ITERS, bt_wins

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_srm_is_sane_for_mod2_assignment(spark):
    r = registry.QUERIES["ml_ab_srm"](spark, SF).collect()[0]
    assert r["n_a"] + r["n_b"] == r["n_users"]
    assert 0.0 <= r["p_srm"] <= 1.0
    # user_id % 2 over sequential ids is a near-perfect 50/50: no alarm
    assert r["srm_flag"] == 0


def test_bayes_ab_posterior_consistency(spark):
    r = registry.QUERIES["stat_bayes_ab"](spark, SF).collect()[0]
    assert 0.0 < r["mu_a"] < 1.0 and 0.0 < r["mu_b"] < 1.0
    assert 0.0 <= r["p_b_beats_a"] <= 1.0
    # probability sides with the larger posterior mean
    if r["mu_b"] > r["mu_a"]:
        assert r["p_b_beats_a"] >= 0.5
    elif r["mu_b"] < r["mu_a"]:
        assert r["p_b_beats_a"] <= 0.5


def test_permutation_test_bounds(spark):
    r = registry.QUERIES["stat_permutation_test"](spark, SF).collect()[0]
    assert r["n_perms"] == 64
    assert 0 <= r["n_extreme"] <= r["n_perms"]
    assert 1.0 / 65 <= r["p_value"] <= 1.0
    # click vs view values are drawn identically in the synthetic data:
    # the test must NOT reject at the 1/65 floor
    assert r["p_value"] > 1.0 / 65


def test_bradley_terry_fixed_point(spark):
    rows = registry.QUERIES["ml_bradley_terry"](spark, SF).collect()
    assert len(rows) == 20
    strengths = {r["source"]: r["strength"] for r in rows}
    assert all(np.isfinite(v) and v > 0 for v in strengths.values())
    # geometric mean ~ 1 (normalization)
    gm = np.exp(np.mean([np.log(v) for v in strengths.values()]))
    assert abs(gm - 1.0) < 0.01
    # numpy replay: the returned strengths satisfy the MM fixed point
    cells = bt_wins(spark, SF).collect()
    items = sorted({r["winner"] for r in cells} | {r["loser"] for r in cells})
    idx = {s: i for i, s in enumerate(items)}
    k = len(items)
    W = np.zeros((k, k))
    for c in cells:
        W[idx[c["winner"]], idx[c["loser"]]] = c["wins"]
    N = W + W.T
    wi = W.sum(axis=1)
    g = np.array([strengths[s] for s in items])
    denom = (N / np.add.outer(g, g)).sum(axis=1)
    resid = np.abs(g * denom - wi)
    # at the fixed point expected wins == actual wins (rounding slack)
    assert resid.max() < 0.05 * max(wi.max(), 1)
    # total expected wins match total games/... sanity: expected == actual sum
    assert abs((g * denom).sum() - wi.sum()) < 1.0


def test_bradley_terry_deterministic(spark):
    a = registry.QUERIES["ml_bradley_terry"](spark, SF).collect()
    b = registry.QUERIES["ml_bradley_terry"](spark, SF).collect()
    assert a == b
