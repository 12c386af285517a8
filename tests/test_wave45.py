"""Wave 45 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math

import duckdb

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_fisher_matches_exact_lgamma(spark):
    """The Stirling-approximated two-sided p must agree with an exact
    math.lgamma hypergeometric computation to well inside the 4-decimal
    rounding grid."""
    r = registry.QUERIES["stat_fisher_exact"](spark, SF).collect()[0]
    a, b, c, d = r["a"], r["b"], r["c"], r["d"]
    r1, c1, n = a + b, a + c, a + b + c + d

    def lp(k):
        lf = math.lgamma
        return (
            lf(r1 + 1)
            + lf(n - r1 + 1)
            + lf(c1 + 1)
            + lf(n - c1 + 1)
            - lf(n + 1)
            - lf(k + 1)
            - lf(r1 - k + 1)
            - lf(c1 - k + 1)
            - lf(n - r1 - c1 + k + 1)
        )

    p_obs = math.exp(lp(a))
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    p_two = sum(
        math.exp(lp(k))
        for k in range(lo, hi + 1)
        if math.exp(lp(k)) <= p_obs * (1 + 1e-7)
    )
    assert abs(r["p_obs"] - p_obs) < 5e-4
    assert abs(r["p_two_sided"] - p_two) < 5e-4
    assert 0.0 <= r["p_two_sided"] <= 1.0 + 1e-9
    # two-sided p always includes the observed table itself
    assert r["p_two_sided"] >= r["p_obs"] - 1e-9


def test_bh_fdr_structure(spark):
    """p_adj >= p per cell, BH rejects are a subset of raw rejects,
    and cells cover the full type x weekday grid."""
    rows = registry.QUERIES["stat_bh_fdr"](spark, SF).collect()
    n_types = duckdb.sql(
        f"SELECT COUNT(DISTINCT event_type) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert len(rows) == n_types * 7
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0 + 1e-9
        assert r["p_adj"] >= r["p"] - 1e-9
        if r["reject"]:
            assert r["p"] <= 0.05 + 1e-9
    # adjusted p is monotone in raw p (same ordering => BH staircase)
    by_p = sorted(rows, key=lambda r: (r["p"], r["event_type"], r["weekday"]))
    adj = [r["p_adj"] for r in by_p]
    assert all(x <= y + 1e-9 for x, y in zip(adj, adj[1:]))


def test_durbin_watson_range(spark):
    r = registry.QUERIES["stat_durbin_watson"](spark, SF).collect()[0]
    assert r["n_days"] > 100
    assert 0.0 <= r["dw"] <= 4.0


def test_partial_corr_bounds(spark):
    r = registry.QUERIES["stat_partial_corr"](spark, SF).collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "r_partial"):
        assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9
    # partial correlation must differ from raw when the confounder binds
    assert r["r_xy"] != r["r_partial"]
