"""Wave 65 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ensemble_accuracies_bounded(spark):
    r = registry.QUERIES["ml_ensemble_vote"](spark, SF).collect()[0]
    accs = [r["acc_c0"], r["acc_c1"], r["acc_c2"], r["acc_vote"]]
    assert all(0.0 <= a <= 1.0 for a in accs)
    assert r["n"] == 500


def test_elasticity_outputs(spark):
    r = registry.QUERIES["ev_price_elasticity"](spark, SF).collect()[0]
    assert r["n_lines"] > 1000
    assert 0.0 <= r["r2"] <= 1.0


def test_temporal_split_leakage_accounting(spark):
    rows = registry.QUERIES["ds_temporal_split"](spark, SF).collect()
    by = {r["split"]: r for r in rows}
    assert set(by) == {"train", "eval"}
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(f"{SF}/events.parquet").count()
    ov = {r["overlap_users"] for r in rows}
    assert len(ov) == 1
    overlap = ov.pop()
    # overlap can't exceed either side's user count
    for r in rows:
        assert overlap <= r["n_users"]
        assert 0.0 <= r["leak_share"] <= 1.0
    # synthetic users are active all month: heavy leakage expected —
    # exactly what this op exists to expose
    assert overlap > 0


def test_stream_progress_accounting(spark):
    rows = registry.QUERIES["stream_progress_report"](spark, SF).collect()
    assert rows
    total_in = sum(r["input_rows"] for r in rows)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total_in == n_events
    for r in rows:
        assert r["state_rows"] >= 0
