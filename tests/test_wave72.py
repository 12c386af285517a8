"""Wave 72 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_haar_energy_shares_sum_to_one(spark):
    rows = registry.QUERIES["ev_haar_energy"](spark, SF).collect()
    assert len(rows) == 3
    total = sum(r["energy_share"] for r in rows)
    assert abs(total - 1.0) < 0.01
    for r in rows:
        assert r["energy"] >= 0
        assert r["n_blocks"] >= 1


def test_uncertainty_sample_is_nearest_half(spark):
    rows = registry.QUERIES["ds_uncertainty_sample"](spark, SF).collect()
    assert len(rows) == 20
    margins = [r["margin"] for r in rows]
    assert all(0.0 <= m <= 0.5 for m in margins)
    # the selected max margin must not exceed any unselected margin
    sel = {r["vec_id"] for r in rows}
    worst = max(margins)
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    for e in emb:
        if e["vec_id"] in sel:
            continue
        p = 1.0 / (1.0 + math.exp(-float(e["embedding"][0])))
        m = math.floor(abs(p - 0.5) * 10000 + 0.5) / 10000
        assert m >= worst - 1e-9


def test_bland_altman_outside_share(spark):
    r = registry.QUERIES["stat_bland_altman"](spark, SF).collect()[0]
    assert r["loa_lo"] < r["bias"] < r["loa_hi"]
    # ~5% expected outside the limits; allow generous slack
    assert 0.0 <= r["outside_share"] <= 0.15


def test_orphan_sweep_finds_debris(spark):
    rows = registry.QUERIES["io_orphan_files"](spark, SF).collect()
    by = {r["dir"]: r["referenced"] for r in rows}
    assert by["data/c99-debris"] == 0
    assert sum(1 for v in by.values() if v == 0) == 1
    assert sum(1 for v in by.values() if v == 1) >= 2
