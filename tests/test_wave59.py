"""Wave 59 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_bass_recovers_market_size(spark):
    r = registry.QUERIES["ev_bass_diffusion"](spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter("event_type = 'purchase'")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_days"] >= 3
    if r["m_est"] > 0:  # non-degenerate fit
        # estimated market size within 50% of the true adopter count
        assert 0.5 * n_users <= r["m_est"] <= 1.5 * n_users
        assert r["p_innov"] > 0


def test_overdispersion_outputs(spark):
    r = registry.QUERIES["stat_overdispersion"](spark, SF).collect()[0]
    assert r["n_users"] > 0
    assert r["mean_k"] > 0 and r["var_k"] >= 0
    assert abs(r["dispersion"] - r["var_k"] / r["mean_k"]) < 1e-3
    assert 0.0 <= r["p_dispersion"] <= 1.0
    if r["dispersion"] > 1:
        assert r["nb_r"] > 0


def test_recall_at_k_monotone(spark):
    rows = sorted(
        registry.QUERIES["ml_recall_at_k"](spark, SF).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [1, 2, 3, 4, 5]
    rec = [r["recall"] for r in rows]
    prec = [r["prec"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in rec + prec)
    # recall@k (hits/R) is non-decreasing in k; precision@k need not be
    assert all(a <= b + 1e-9 for a, b in zip(rec, rec[1:]))


def test_snapshot_changes_accounting(spark):
    rows = registry.QUERIES["io_snapshot_changes"](spark, SF).collect()
    assert [r["op"] for r in rows] == ["create", "append", "merge"]
    assert rows[0]["rows_added"] > 0
    assert rows[1]["rows_added"] > 0
    # the merge commit adds the upsert batch dir plus rewritten dirs
    assert rows[2]["new_dirs"] >= 2
