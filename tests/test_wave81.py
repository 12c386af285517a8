"""Wave 81 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_linear_counting_tight(spark):
    r = registry.QUERIES["sketch_linear_counting"](spark, SF).collect()[0]
    assert r["bits_set"] <= r["exact"]  # collisions only shrink the bitmap
    # with n << m the estimator is very tight
    assert r["rel_error"] < 0.05
    assert abs(r["lc_estimate"] - r["exact"]) <= max(2, 0.05 * r["exact"])


def test_ljung_box_outputs(spark):
    r = registry.QUERIES["stat_ljung_box"](spark, SF).collect()[0]
    assert r["n_days"] > 10
    assert r["q_stat"] >= 0
    assert 0.0 <= r["p_value"] <= 1.0


def test_dpp_fires(spark):
    rows = registry.QUERIES["io_dynamic_partition_pruning"](spark, SF).collect()
    assert rows
    assert all(r["pruning_visible"] == 1 for r in rows)
    total = sum(r["n"] for r in rows)
    # only urgent+high partitions contribute
    from pyspark.sql import functions as F

    want = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .count()
    )
    assert total == want
