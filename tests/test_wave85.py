"""Wave 85 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_dp_noise_bounded_and_applied(spark):
    rows = registry.QUERIES["ds_dp_noisy_counts"](spark, SF).collect()
    assert len(rows) == 20
    diffs = [abs(r["noisy_count"] - r["true_count"]) for r in rows]
    # Laplace(1/eps=1) tail: the deterministic draws land within a few
    # scale units (the fixed hash gives max |L| = 17 here); at least
    # one group must actually move (mechanism applied)
    assert max(diffs) <= 25
    assert any(d > 0 for d in diffs)
    assert all(r["epsilon"] == 1.0 for r in rows)


def test_token_budget_respected(spark):
    r = registry.QUERIES["ds_token_budget_trim"](spark, SF).collect()[0]
    assert r["tokens_kept"] <= r["budget"]
    assert 0 < r["docs_kept"] <= r["docs_total"]
    # greedy by quality-per-token keeps MORE docs than the token share
    # (cheap high-quality docs first)
    assert r["keep_share"] >= 0.45


def test_silhouette_bounds(spark):
    rows = registry.QUERIES["ml_silhouette"](spark, SF).collect()
    assert len(rows) == 10
    assert sum(r["n"] for r in rows) == 500
    for r in rows:
        assert -1.0 <= r["silhouette"] <= 1.0


def test_decayed_counts_bounds(spark):
    rows = registry.QUERIES["ev_decayed_counts"](spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        # decayed count is a strict discount of the raw count
        assert 0 < r["decayed_count"] < r["raw_count"]
        assert 0 < r["recency_index"] < 1
