"""Wave 146 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pot_gpd(spark):
    r = registry.QUERIES["stat_pot_gpd"](spark, SF).collect()[0]
    assert r["exceedances"] > 10
    assert r["threshold"] > 0
    assert r["gpd_sigma"] > 0
    # bounded uniform-ish prices → negative (bounded-tail) shape
    assert r["gpd_xi"] < 0.5
    # the extrapolated return level must exceed the threshold
    assert r["return_level"] > r["threshold"]


def test_backfill_manifest_matches_health(spark):
    manifest = registry.QUERIES["ds_backfill_manifest"](spark, SF).collect()
    health = registry.QUERIES["ev_stream_health"](spark, SF).collect()[0]
    # the manifest names exactly the gaps stream-health counts
    assert len(manifest) == health["gap_days"]
    for r in manifest:
        assert r["age_days"] >= 0
