"""Wave 38 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_kendall_tau_bounds_and_counts(spark):
    """tau_b in [-1, 1]; concordant+discordant can't exceed n0."""
    rows = registry.QUERIES["stat_kendall_tau"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    n0 = r["n_days"] * (r["n_days"] - 1) // 2
    assert r["conc"] + r["disc"] <= n0
    assert -1.0 <= r["tau_b"] <= 1.0


def test_theil_sen_pair_counts(spark):
    """Every type appears; pair count is exactly n_days choose 2."""
    rows = registry.QUERIES["stat_theil_sen"](spark, SF).collect()
    assert len(rows) == 5
    # cross-check pair counts against the day counts per type
    import duckdb

    days = dict(
        duckdb.sql(
            "SELECT event_type, COUNT(DISTINCT epoch_us(ts) // 86400000000) "
            f"FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        n = days[r["event_type"]]
        assert r["n_pairs"] == n * (n - 1) // 2
        assert math.isfinite(r["slope_cents_per_day"])


def test_pr_auc_bounds_vs_prevalence(spark):
    """AP is within (0, 1] and ≥ prevalence for a better-than-random
    ranking lower bound sanity (random scores give AP ≈ prevalence;
    we only check the hard bound AP ≥ 0 and ≤ 1 plus count math)."""
    rows = registry.QUERIES["ml_pr_auc"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.0 < r["avg_precision"] <= 1.0


def test_fsm_match_subset_logic(spark):
    """Pattern counts are consistent: converted users are a subset of
    all users; pure_browser and converted are disjoint (a converted
    journey contains p, a pure_browser one cannot)."""
    rows = {
        r["pattern"]: r
        for r in registry.QUERIES["ev_fsm_match"](spark, SF).collect()
    }
    assert set(rows) == {
        "converted",
        "error_then_purchase",
        "signup_first",
        "pure_browser",
    }
    total_users_share = sum(r["share"] for r in rows.values())
    assert all(0 <= r["share"] <= 1 for r in rows.values())
    assert rows["converted"]["n_users"] > 0  # non-vacuous on the corpus
    assert total_users_share > 0
