"""Wave 82 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_control_chart_limits(spark):
    rows = registry.QUERIES["stat_control_chart"](spark, SF).collect()
    assert len(rows) >= 25
    centers = {r["center"] for r in rows}
    assert len(centers) == 1
    for r in rows:
        assert r["lcl"] < r["center"] < r["ucl"]
        inside = r["lcl"] <= r["xbar"] <= r["ucl"]
        assert r["out_of_control"] == (0 if inside else 1)
    # 3-sigma: the large majority of days must be in control
    ooc = sum(r["out_of_control"] for r in rows)
    assert ooc <= len(rows) * 0.2


def test_masked_aggregation_identity(spark):
    rows = registry.QUERIES["ds_masked_aggregation"](spark, SF).collect()
    assert len(rows) == 8
    assert all(r["partial_opaque"] == 1 for r in rows)
    assert all(r["total_recovered"] == 1 for r in rows)
    # replay: sum of masked partials equals the true total in cents
    total_masked = sum(r["masked_partial_cents"] for r in rows)
    true_total = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long"))
        .collect()[0][0]
    )
    # per-party floor-rounding vs global floor can differ by < P cents
    assert abs(total_masked - true_total) < 8


def test_posthoc_bh_monotone(spark):
    rows = registry.QUERIES["stat_pairwise_posthoc"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r["p_raw"] <= 1.0
        assert r["p_raw"] <= r["p_bh"] + 1e-9  # BH never shrinks below raw
        assert r["significant"] == (1 if r["p_bh"] < 0.05 else 0)
