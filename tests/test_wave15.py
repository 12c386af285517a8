"""Wave 15 gates: single-exchange peak detection, oversampling balance,
and cross-correlation bounds."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import count_shuffles, physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_peak_detection_single_shuffle(spark):
    df = registry.QUERIES["ev_peak_detection"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)


def test_oversample_moves_toward_parity(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat

    docs = cat(spark, SF)["documents"]
    before = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    after = {
        r.lang: r["count"]
        for r in registry.QUERIES["ds_oversample"](spark, SF)
        .groupBy("lang")
        .count()
        .collect()
    }
    mx = max(before.values())
    for lang, n in before.items():
        reps = -(-mx // n)  # ceil
        assert after[lang] == n * reps, (lang, n, after[lang])
        assert after[lang] >= mx, "every lang must reach at least parity"
        # never more than double-overshoot parity
        assert after[lang] < mx + n, (lang, after[lang], mx, n)


def test_xcorr_values_bounded(spark):
    rows = registry.QUERIES["ev_cross_correlation"](spark, SF).collect()
    assert {r.lag for r in rows} == {-2, -1, 0, 1, 2}
    for r in rows:
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9
