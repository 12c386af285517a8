"""Wave 129 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_prediction_interval_widens(spark):
    rows = sorted(
        registry.QUERIES["stat_prediction_interval"](spark, SF).collect(),
        key=lambda r: r["probe_x"],
    )
    assert len(rows) == 3
    for r in rows:
        assert r["pi_lo"] < r["predicted"] < r["pi_hi"]
    # PI is narrowest near the mean quantity (~25) and widens outward
    widths = {r["probe_x"]: r["pi_hi"] - r["pi_lo"] for r in rows}
    assert widths[25.0] <= widths[10.0] + 1e-6
    assert widths[25.0] <= widths[45.0] + 1e-6


def test_label_spreading(spark):
    r = registry.QUERIES["ml_label_spreading"](spark, SF).collect()[0]
    assert r["seeds"] == 10
    assert r["spread_to"] > 0
    assert 0.0 < r["coverage"] <= 1.0
    # random-parity labels: spread accuracy hovers at chance — the
    # honest read; structure would push it up
    assert 0.3 <= r["accuracy"] <= 0.75


def test_minhash_error_curve(spark):
    rows = sorted(
        registry.QUERIES["dd_minhash_error_curve"](spark, SF).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [8, 16, 32, 64]
    assert all(r["pairs"] > 0 for r in rows)
    # k=64 must beat k=8 on mean absolute error
    assert rows[-1]["mean_abs_error"] <= rows[0]["mean_abs_error"] + 1e-9
    assert all(0.0 <= r["mean_abs_error"] < 0.3 for r in rows)
