"""Wave 90 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_referential_integrity_clean(spark):
    rows = registry.QUERIES["io_referential_integrity"](spark, SF).collect()
    assert len(rows) == 4
    by = {r["relation"]: r for r in rows}
    assert set(by) == {
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
    }
    for r in rows:
        assert r["child_rows"] > 0
        # driver testdata is FK-clean; the audit must PROVE it
        assert r["orphan_rows"] == 0


def test_dkw_band_geometry(spark):
    rows = sorted(
        registry.QUERIES["stat_dkw_band"](spark, SF).collect(),
        key=lambda r: r["q"],
    )
    assert [r["q"] for r in rows] == [round(0.1 * i, 1) for i in range(1, 10)]
    xs = [r["x_q"] for r in rows]
    assert xs == sorted(xs)  # quantiles are monotone
    for r in rows:
        assert r["band_lo"] <= r["q"] <= r["band_hi"]
        assert r["eps"] > 0


def test_cvm_positive(spark):
    r = registry.QUERIES["stat_cvm"](spark, SF).collect()[0]
    assert r["na"] > 0 and r["nb"] > 0
    assert r["cvm_t"] >= 0


def test_permutation_importance(spark):
    rows = registry.QUERIES["ml_permutation_importance"](spark, SF).collect()
    assert len(rows) == 5
    base = {r["base_loss"] for r in rows}
    assert len(base) == 1  # same baseline on every row
    for r in rows:
        # permuting a feature cannot meaningfully REDUCE the loss
        assert r["delta"] > -0.01
        # perm/base/delta are each floor-rounded on the 1e-6 grid from
        # raw values, so the reconstruction can be off by one grid cell
        assert abs(r["perm_loss"] - r["base_loss"] - r["delta"]) <= 2e-6
    deltas = [r["delta"] for r in rows]
    assert deltas == sorted(deltas, reverse=True)
