"""Wave 187 behavior gates beyond the registry oracle parity.

Hoeffding's D must SEE non-monotonic dependence (the whole reason it
exists next to Spearman) and read ~0 on an independent grid; Mood's
median test must fire on a location-shifted group; Ansari-Bradley must
fire on a scale difference with matched medians.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(rows, "l_quantity double, l_discount double").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "lineitem.parquet"))


def test_hoeffding_d_sees_nonmonotonic_dependence(spark, tmp_path):
    from mister_spark.operators.extras187 import stat_hoeffding_d

    # U-shape: y = (x-5)^2 — Spearman-invisible, Hoeffding-visible
    rows = [(float(x), float((x - 5) ** 2)) for x in range(11)] * 20
    _write_lineitem(spark, tmp_path, rows)
    d_dep = stat_hoeffding_d(spark, str(tmp_path)).collect()[0]
    assert d_dep["n"] == 220
    assert d_dep["hoeffding_d"] > 0.05, d_dep

    # independent uniform grid: every (x, y) cell equally likely -> ~0
    rows = [(float(x), float(y)) for x in range(10) for y in range(10)] * 3
    _write_lineitem(spark, tmp_path, rows)
    d_ind = stat_hoeffding_d(spark, str(tmp_path)).collect()[0]
    assert abs(d_ind["hoeffding_d"]) < 0.01, d_ind
    assert d_dep["hoeffding_d"] > 10 * abs(d_ind["hoeffding_d"])


def _write_events(spark, tmp_path, rows):
    (
        spark.createDataFrame(rows, "event_type string, value double")
        .withColumn("event_id", F.monotonically_increasing_id())
        .withColumn("user_id", F.lit(0).cast("long"))
        .withColumn("ts", F.lit("2024-01-01").cast("timestamp"))
        .withColumn("props", F.lit("{}"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_mood_median_fires_on_location_shift(spark, tmp_path):
    from mister_spark.operators.extras187 import stat_mood_median

    # group 'hi' sits entirely above group 'lo': maximal 2x2 separation
    rows = [("lo", float(v)) for v in range(100)] + [
        ("hi", float(v + 1000)) for v in range(100)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in stat_mood_median(spark, str(tmp_path)).collect()}
    assert out["lo"]["above"] == 0
    # pooled lower median = value 99 ('lo' max); every 'hi' row exceeds it
    assert out["hi"]["above"] == 100
    assert out["hi"]["chi2"] > 50, out["hi"]["chi2"]


def test_ansari_bradley_fires_on_scale_difference(spark, tmp_path):
    from mister_spark.operators.extras187 import stat_ansari_bradley

    # same center, view 10x wider: click hoards the big middle scores
    click = [("click", 500.0 + d) for d in range(-50, 50)]
    view = [("view", 500.0 + 10 * d) for d in range(-50, 50)]
    _write_events(spark, tmp_path, click + view)
    r = stat_ansari_bradley(spark, str(tmp_path)).collect()[0]
    assert r["n1"] == 100 and r["n2"] == 100
    assert r["ab_statistic"] > r["expected"], r
    assert r["z"] > 3, r
