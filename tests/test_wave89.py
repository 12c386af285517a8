"""Wave 89 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_bollinger_band_geometry(spark):
    rows = registry.QUERIES["ev_bollinger_breakouts"](spark, SF).collect()
    assert len(rows) >= 20
    for r in rows:
        assert r["lower"] < r["mid"] < r["upper"]
        if r["breakout"] == 1:
            assert r["close"] > r["upper"]
        elif r["breakout"] == -1:
            assert r["close"] < r["lower"]
        else:
            assert r["lower"] <= r["close"] <= r["upper"]


def test_mttr_mtbf_positive(spark):
    r = registry.QUERIES["ev_mttr_mtbf"](spark, SF).collect()[0]
    assert r["n_errors"] > 0
    assert r["mtbf_hours"] > 0
    assert r["mttr_minutes"] > 0
    # recovery (any next event) must be faster than the next failure
    assert r["mttr_minutes"] / 60.0 < r["mtbf_hours"]


def test_negbin_fit_params(spark):
    r = registry.QUERIES["stat_negbin_fit"](spark, SF).collect()[0]
    # overdispersed counts: 0 < p < 1 and r > 0 must hold for a valid NB
    assert 0.0 < r["p"] < 1.0
    assert r["r"] > 0
    assert r["chi2"] >= 0
    assert r["dof"] >= 1


def test_stream_decayed_counts_parity(spark):
    got = registry.QUERIES["stream_decayed_counts"](spark, SF).collect()
    batch = {
        r["event_type"]: r
        for r in registry.QUERIES["ev_decayed_counts"](spark, SF).collect()
    }
    assert len(got) == len(batch)
    # the replay must exercise the merge rule across >= 2 micro-batches
    assert got[0]["n_batches"] >= 2
    for r in got:
        b = batch[r["event_type"]]
        assert r["raw_count"] == b["raw_count"]
        # aging is multiplicative float math: equal to the rounding grid
        assert abs(r["decayed_count"] - b["decayed_count"]) <= 2e-4
        assert abs(r["recency_index"] - b["recency_index"]) <= 2e-4
