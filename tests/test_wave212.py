"""Wave 212 behavior gates beyond the registry oracle parity.

The lasso path must keep the one truly-predictive feature as lambda
rises (exact zeros elsewhere) and recover all signs at lambda = 0;
Chow must certify a planted slope break with the right per-segment
slopes and read an unbroken line as no-break.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderdate string, o_orderpriority string, o_totalprice double"
    ).select(
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
        "o_totalprice",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_lasso_selects_the_real_feature(spark, tmp_path):
    from mister_spark.operators.extras212 import ml_lasso_cd

    # y = 5000 * priority_digit + small structured residue; weekday
    # and epoch-day carry only that residue
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(300):
        day = (d0 + datetime.timedelta(days=i % 60)).strftime("%Y-%m-%d")
        g = (i % 5) + 1
        rows.append((day, f"{g}-P", 5000.0 * g + 31.0 * ((i * 7) % 11)))
    _write_orders(spark, tmp_path, rows)
    out = {r["lam"]: r for r in ml_lasso_cd(spark, str(tmp_path)).collect()}
    assert set(out) == {0.0, 0.1, 0.3, 0.6}
    # lam=0 = OLS: priority dominates with the right sign
    assert out[0.0]["coef_priority"] > 0.9, out[0.0]
    # moderate lambda: ONLY priority survives (exact zeros elsewhere)
    assert out[0.3]["n_nonzero"] == 1, out[0.3]
    assert out[0.3]["coef_priority"] > 0.3, out[0.3]
    assert out[0.3]["coef_weekday"] == 0.0 == out[0.3]["coef_epochday"]
    # the path is monotone in fit: r2 never rises with lambda
    r2s = [out[l]["r2"] for l in (0.0, 0.1, 0.3, 0.6)]
    assert all(a >= b - 1e-9 for a, b in zip(r2s, r2s[1:])), r2s
    # priority's correlation is ~1.0 here, so even lam=0.6 keeps it —
    # but shrunk by exactly lambda on the correlation scale
    assert out[0.6]["n_nonzero"] == 1, out[0.6]
    assert out[0.6]["coef_priority"] < out[0.0]["coef_priority"] - 0.5


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 09:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_chow_certifies_planted_slope_break(spark, tmp_path):
    from mister_spark.operators.extras212 import stat_chow_test

    # first 30 days flat at 20/day, next 30 days climbing 3/day
    counts = [20] * 30 + [20 + 3 * i for i in range(1, 31)]
    _write_daily_events(spark, tmp_path, counts)
    r = stat_chow_test(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 60, r
    assert r["break_date"] == "2024-01-30", r
    assert r["f_stat"] > 50 and r["p_value"] < 1e-6, r
    assert abs(r["slope_pre"]) < 0.2 and r["slope_post"] > 2.5, r
    assert r["sse_reduction"] > 0.5, r

    # one unbroken line: slope continuous through the midpoint
    _write_daily_events(spark, tmp_path, [20 + i for i in range(60)])
    r = stat_chow_test(spark, str(tmp_path)).collect()[0]
    assert r["p_value"] > 0.5, r
    assert abs(r["slope_pre"] - r["slope_post"]) < 0.01, r
