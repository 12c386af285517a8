"""Wave 80 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_model_card_cross_consistency(spark):
    rows = {
        (r["section"], r["metric"]): r["value"]
        for r in registry.QUERIES["ml_model_card"](spark, SF).collect()
    }
    assert rows[("data", "n_pos")] + rows[("data", "n_neg")] == 500
    assert 0.0 <= rows[("discrimination", "auc")] <= 1.0
    assert 0.0 <= rows[("discrimination", "ks_stat")] <= 1.0
    assert rows[("fairness", "eq_odds_flagged_groups")] >= 0
    # cross-check against the source operator directly
    auc = registry.QUERIES["ml_auc"](spark, SF).collect()[0]
    assert rows[("discrimination", "auc")] == auc["auc"]


def test_rich_club_monotone_inclusion(spark):
    rows = {r["top_pct"]: r for r in
            registry.QUERIES["graph_rich_club"](spark, SF).collect()}
    assert set(rows) == {10, 25}
    assert rows[10]["club_size"] <= rows[25]["club_size"]
    for r in rows.values():
        assert 0.0 <= r["phi"] <= 1.0
        assert r["club_edges"] <= r["club_size"] * (r["club_size"] - 1) / 2


def test_codec_roundtrips_and_sizes(spark):
    rows = {r["codec"]: r for r in
            registry.QUERIES["io_codec_compare"](spark, SF).collect()}
    assert set(rows) == {"snappy", "gzip", "zstd"}
    for r in rows.values():
        assert r["roundtrip_ok"] == 1
        assert r["n_bytes"] > 0
    assert rows["snappy"]["vs_snappy"] == 1.0
    # gzip and zstd both out-compress snappy on this data
    assert rows["zstd"]["vs_snappy"] < 1.0
    assert rows["gzip"]["vs_snappy"] < 1.0
