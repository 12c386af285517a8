"""Wave 66 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_macd_identities(spark):
    rows = sorted(
        registry.QUERIES["ev_macd"](spark, SF).collect(), key=lambda r: r["day"]
    )
    assert len(rows) >= 25
    for r in rows:
        assert abs(r["macd"] - (r["ema_fast"] - r["ema_slow"])) < 2e-4
        assert abs(r["histogram"] - (r["macd"] - r["signal"])) < 2e-4
    # first point: every EMA equals the first observation
    f = rows[0]
    assert abs(f["ema_fast"] - f["n"]) < 1e-3
    assert abs(f["ema_slow"] - f["n"]) < 1e-3


def test_coreset_radius_monotone(spark):
    rows = sorted(
        registry.QUERIES["ds_coreset_kcenter"](spark, SF).collect(),
        key=lambda r: r["iteration"],
    )
    assert len(rows) == 10
    radii = [r["coverage_radius"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))
    centers = [r["center_vec_id"] for r in rows]
    assert len(set(centers)) == len(centers)
    assert centers[0] == 0


def test_snapshot_history_sequence(spark):
    rows = sorted(
        registry.QUERIES["io_snapshot_history"](spark, SF).collect(),
        key=lambda r: r["version"],
    )
    assert [r["op"] for r in rows] == [
        "create",
        "append",
        "delete_range",
        "merge",
    ]
    # append grows, delete shrinks
    assert rows[1]["live_rows"] > rows[0]["live_rows"]
    assert rows[2]["live_rows"] < rows[1]["live_rows"]


def test_weibull_detects_memoryless_arrivals(spark):
    r = registry.QUERIES["stat_weibull_fit"](spark, SF).collect()[0]
    assert r["n_gaps"] > 500
    # synthetic arrivals are Poisson: shape must sit near 1
    assert 0.7 <= r["shape"] <= 1.3
    assert r["scale_s"] > 0
    assert r["r2"] > 0.9
