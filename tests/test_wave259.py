"""Wave 259 behavior gates beyond the registry oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_binary_quantize_recall_beats_random(spark):
    rows = registry.QUERIES["emb_binary_quantize"](spark, SF).collect()
    assert len(rows) == 10  # 500 vectors / qmod 50
    for r in rows:
        assert 0.0 <= r[f"recall_at_10"] <= 1.0
        assert r["n_hits"] == round(r["recall_at_10"] * 10)
        assert r["compression_x"] == 32
    # random top-10 of ~500 would recall ~10/500 = 0.02 per slot;
    # sign-bit Hamming must do far better on average
    mean = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean >= 0.15, mean


def test_packed_code_roundtrips_signs(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat
    from mister_spark.operators.extras259 import _spark_pack

    e = cat(spark, SF)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).limit(20)
    rows = e.select(
        "v", _spark_pack(F.col("v")).alias("code")
    ).collect()
    for r in rows:
        code = r["code"] & (2**64 - 1)  # view as unsigned word
        for i, x in enumerate(r["v"]):
            assert ((code >> i) & 1) == (1 if x > 0 else 0), i
