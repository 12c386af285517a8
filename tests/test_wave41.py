"""Wave 41 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_runs_test_count_consistency(spark):
    """Run count is bounded by move count and at least 1; z finite."""
    r = registry.QUERIES["stat_runs_test"](spark, SF).collect()[0]
    n = r["n_up"] + r["n_down"]
    assert n > 0
    assert 1 <= r["n_runs"] <= n
    assert math.isfinite(r["z"])


def test_feature_screen_all_dims_bounded(spark):
    """One correlation per dim, all within [-1, 1]."""
    rows = registry.QUERIES["ml_feature_screen"](spark, SF).collect()
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0


def test_js_divergence_bounds_and_symmetric_pairs(spark):
    """JS is within [0, ln 2]; every unordered source pair appears
    exactly once."""
    rows = registry.QUERIES["tx_js_divergence"](spark, SF).collect()
    ln2 = math.log(2.0)
    pairs = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        pairs.add((r["src_a"], r["src_b"]))
        assert -1e-9 <= r["js"] <= ln2 + 1e-9
        assert r["shared_types"] > 0
    assert len(pairs) == len(rows) == 190  # C(20, 2)


def test_assortativity_bounded_and_nondegenerate(spark):
    """The heavy-trade graph has degree variance (the raw graph is
    complete at sf0.01, which is why the threshold exists), and the
    coefficient lives in [-1, 1]."""
    r = registry.QUERIES["graph_assortativity"](spark, SF).collect()[0]
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0
