"""Wave 74 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_clone_is_zero_copy_and_diverges(spark):
    rows = {r["table"]: r for r in
            registry.QUERIES["io_snapshot_clone"](spark, SF).collect()}
    assert rows["source"]["zero_copy"] == 1
    # clone diverged by its own append; source untouched
    assert rows["clone"]["live_rows"] > rows["source"]["live_rows"]
    assert rows["source"]["live_rows"] == rows["clone"]["rows_at_clone"]


def test_roc_hull_dominates_and_monotone(spark):
    rows = registry.QUERIES["ml_roc_hull"](spark, SF).collect()
    assert len(rows) >= 3
    assert sum(r["cost_optimal"] for r in rows) == 1
    pts = sorted((r["fpr"], r["tpr"]) for r in rows)
    # hull is monotone in both axes and concave (no point under a chord)
    for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
        assert x2 >= x1 - 1e-9
        assert y2 >= y1 - 1e-9
    assert pts[0] == (0.0, 0.0)
    assert pts[-1] == (1.0, 1.0)


def test_synthetic_control_beats_naive(spark):
    r = registry.QUERIES["ev_synthetic_control"](spark, SF).collect()[0]
    # the fitted blend must track the pre-period at least as well as
    # the uniform donor average
    assert r["pre_rmse"] <= r["naive_rmse"] + 1e-9
    assert r["top_donors"]
    # simplex weights: top-3 shares within [0, 1]
    for part in r["top_donors"].split(","):
        v = float(part.split(":")[1])
        assert 0.0 <= v <= 1.0
