"""Wave 237 behavior gates beyond the registry oracle parity.

Breslow-Day must accept homogeneous stratum odds ratios and fire
when one stratum's association reverses; the geometric median must
shrug off planted outlier days that visibly drag the mean.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderdate_s string, o_orderpriority string, o_orderstatus string",
    ).select(
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority", "o_orderstatus",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def _stratum_rows(day, a, b, c, d):
    """One weekday stratum: a=(urgent,F), b=(urgent,O), c=(other,F),
    d=(other,O)."""
    rows = []
    rows += [(day, "1-URGENT", "F")] * a
    rows += [(day, "1-URGENT", "O")] * b
    rows += [(day, "3-MEDIUM", "F")] * c
    rows += [(day, "3-MEDIUM", "O")] * d
    return rows


def test_breslow_day_reads_homogeneity(spark, tmp_path):
    from mister_spark.operators.extras237 import stat_breslow_day

    d0 = datetime.date(2024, 1, 1)  # Monday
    days = [(d0 + datetime.timedelta(days=k)).strftime("%Y-%m-%d") for k in range(3)]
    # homogeneous OR = 3 in all three strata (same table everywhere)
    rows = []
    for day in days:
        rows += _stratum_rows(day, 30, 10, 25, 25)
    _write_orders(spark, tmp_path, rows)
    r = stat_breslow_day(spark, str(tmp_path)).collect()[0]
    assert r["n_strata"] == 3, r
    assert abs(r["or_mh"] - 3.0) < 0.01, r
    assert r["bd_chi2"] < 0.5 and r["p_value"] > 0.5, r

    # heterogeneous: stratum 3 REVERSES the association
    rows = []
    rows += _stratum_rows(days[0], 30, 10, 10, 30)
    rows += _stratum_rows(days[1], 30, 10, 10, 30)
    rows += _stratum_rows(days[2], 10, 30, 30, 10)
    _write_orders(spark, tmp_path, rows)
    r = stat_breslow_day(spark, str(tmp_path)).collect()[0]
    assert r["bd_chi2"] > 15, r
    assert r["p_value"] < 0.001, r


def _write_events(spark, tmp_path, day_profiles):
    """day_profiles: list of (n_events, n_purchases)."""
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, (n, p) in enumerate(day_profiles):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for i in range(n):
            et = "purchase" if i < p else "view"
            rows.append((eid, f"{d} 16:00:00", et))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, event_type string"
        )
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_geometric_median_resists_outlier_days(spark, tmp_path):
    from mister_spark.operators.extras237 import stat_geometric_median

    # 28 ordinary days near (50, 10), two incident days at (500, 2)
    profiles = [(50 + (i % 3), 10 + (i % 2)) for i in range(28)]
    profiles += [(500, 2), (480, 1)]
    _write_events(spark, tmp_path, profiles)
    r = stat_geometric_median(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 30, r
    # the mean is dragged ~30 units toward the incidents; the
    # geometric median stays with the bulk
    assert r["mean_events"] > 75, r
    assert r["gm_events"] < 55, r
    assert r["outlier_displacement"] > 20, r

    # no outliers: centers agree
    _write_events(spark, tmp_path, [(50 + (i % 3), 10) for i in range(30)])
    r = stat_geometric_median(spark, str(tmp_path)).collect()[0]
    assert r["outlier_displacement"] < 1.0, r
