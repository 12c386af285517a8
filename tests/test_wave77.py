"""Wave 77 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import hashlib

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_borda_fusion_shape(spark):
    rows = registry.QUERIES["ml_borda_fusion"](spark, SF).collect()
    assert len(rows) == 80  # 8 queries x top 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r["rn"])
        bordas = [r["borda"] for r in lst]
        assert bordas == sorted(bordas)
        # the best possible Borda is 3 (rank 1 in all three)
        assert bordas[0] >= 3


def test_deming_slope_symmetry(spark):
    r = registry.QUERIES["stat_deming_regression"](spark, SF).collect()[0]
    assert r["n"] == 500
    assert -1.0 <= r["corr"] <= 1.0
    # Deming slope and correlation share a sign
    if abs(r["corr"]) > 0.01:
        assert (r["slope"] > 0) == (r["corr"] > 0)


def test_fairness_audit_gaps(spark):
    rows = registry.QUERIES["ml_fairness_audit"](spark, SF).collect()
    assert len(rows) == 5  # languages
    for r in rows:
        assert 0.0 <= r["tpr"] <= 1.0
        assert 0.0 <= r["fpr"] <= 1.0
        assert r["eq_odds_flag"] in (0, 1)
    total = sum(r["n"] for r in rows)
    assert total == 500


def test_checksums_detect_tamper(spark):
    rows = registry.QUERIES["io_file_checksums"](spark, SF).collect()
    assert rows
    # re-hash independently and compare
    import os

    path = os.path.join(SF, "orders.parquet")
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))
         if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    want = {}
    for fp in files:
        h = hashlib.md5()
        with open(fp, "rb") as f:
            h.update(f.read())
        want[os.path.basename(fp)] = h.hexdigest()
    got = {r["file"]: r["md5"] for r in rows}
    assert got == want
    # a single flipped byte must change the digest
    sample = open(files[0], "rb").read()
    tampered = bytes([sample[0] ^ 1]) + sample[1:]
    assert hashlib.md5(tampered).hexdigest() != want[os.path.basename(files[0])]
