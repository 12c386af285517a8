"""Wave 92 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ledoit_wolf_conditioning(spark):
    r = registry.QUERIES["stat_ledoit_wolf"](spark, SF).collect()[0]
    assert r["dim"] == 64 and r["n"] == 500
    assert 0.0 <= r["delta"] <= 1.0
    assert r["mu"] > 0
    # shrinkage toward muI can only improve (reduce) the condition number
    assert r["cond_after"] <= r["cond_before"] + 1e-9
    assert r["cond_after"] >= 1.0


def test_ledoit_wolf_matches_numpy(spark):
    r = registry.QUERIES["stat_ledoit_wolf"](spark, SF).collect()[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.array([list(e["embedding"]) for e in emb], dtype=np.float64)
    n, d = X.shape
    Xc = X - X.mean(axis=0)
    S = (Xc.T @ Xc) / (n - 1)
    mu = np.trace(S) / d
    d2 = float(np.sum((S - mu * np.eye(d)) ** 2))
    q = float((np.sum(Xc * Xc, axis=1) ** 2).sum())
    b2 = max(min((q / n - float(np.sum(S * S))) / n, d2), 0.0)
    delta = b2 / d2
    assert abs(r["delta"] - round(delta, 6)) < 1e-5
    assert abs(r["mu"] - round(mu, 6)) < 1e-5


def test_shuffle_audit_mixed(spark):
    r = registry.QUERIES["ds_shuffle_audit"](spark, SF).collect()[0]
    assert r["pairs"] > 0
    assert 0 < r["expected_rate"] < 1
    # the md5 shuffle must not produce source runs: |z| < 4
    assert abs(r["z"]) < 4.0


def test_blocklist_screen(spark):
    rows = registry.QUERIES["tx_blocklist_screen"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["flagged"] <= r["docs"]
        assert r["total_hits"] >= r["flagged"] * 0  # non-negative
        if r["flagged"] > 0:
            assert r["total_hits"] >= r["flagged"]
    # the synthetic vocab contains blocklisted tokens → screening bites
    assert any(r["flagged"] > 0 for r in rows)
