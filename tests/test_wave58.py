"""Wave 58 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry
from mister_spark.operators.extras58 import (
    PHASH_MAX_HAMMING,
    _phash_batches,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_tost_outputs(spark):
    r = registry.QUERIES["stat_tost_equivalence"](spark, SF).collect()[0]
    assert r["n"] > 0
    assert r["margin"] > 0
    assert 0.0 <= r["p_tost"] <= 1.0
    assert r["equivalent"] in (0, 1)
    # click and view values are identically distributed in the
    # synthetic data; with a 5%-of-mean margin they must test equivalent
    assert abs(r["diff"]) < r["margin"]


def test_drift_screen_top10_sorted(spark):
    rows = registry.QUERIES["ml_feature_drift_screen"](spark, SF).collect()
    assert len(rows) == 10
    ks = [r["ks"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in ks)
    assert sorted(ks, reverse=True) == ks


def test_phash_identical_and_near_identical(spark):
    import pandas as pd

    base = b"hello world " * 40
    near = bytearray(base)
    near[5] ^= 0x01  # flip one bit of one byte
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["s", "s", "s"],
            "payload": [bytes(base), bytes(base), bytes(near)],
        }
    )
    out = next(_phash_batches(iter([pdf])))
    h1, h2, h3 = out["ph"]
    assert h1 == h2  # identical payloads collide exactly
    assert bin(h1 ^ h3).count("1") <= PHASH_MAX_HAMMING
    # the real query runs and produces symmetric-free ordered pairs
    rows = registry.QUERIES["mm_phash_dedup"](spark, SF).collect()
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0 <= r["hamming"] <= PHASH_MAX_HAMMING


def test_whitening_unit_variance(spark):
    rows = registry.QUERIES["ml_embedding_whitening"](spark, SF).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["var_before"] > 0
        # measured on the transformed data — must be ~1 for every dim
        assert abs(r["var_after"] - 1.0) < 0.01
    # eigen-variances are sorted descending
    vb = [r["var_before"] for r in sorted(rows, key=lambda r: r["component"])]
    assert sorted(vb, reverse=True) == vb
