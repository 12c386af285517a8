"""Wave 190 behavior gates beyond the registry oracle parity.

Tail dependence must read ~1 on comonotone pairs, ~(1-q) under
independence, and ~0 on countermonotone pairs; the ARCH LM statistic
must fire on a planted volatility-clustered series and stay small on
a constant-variance one.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_li(spark, tmp_path, rows):
    spark.createDataFrame(rows, "l_quantity double, l_extendedprice double").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "lineitem.parquet"))


def test_tail_dependence_reads_the_copula(spark, tmp_path):
    from mister_spark.operators.extras190 import stat_tail_dependence

    # comonotone: y = 2x -> extremes always co-occur, both tails ~1
    _write_li(spark, tmp_path, [(float(i), 2.0 * i) for i in range(400)])
    r = stat_tail_dependence(spark, str(tmp_path)).collect()[0]
    assert r["upper_tail_dep"] >= 0.9, r
    assert r["lower_tail_dep"] >= 0.9, r

    # countermonotone: y = -x -> an x-extreme is never a y-extreme
    _write_li(spark, tmp_path, [(float(i), -1.0 * i) for i in range(400)])
    r = stat_tail_dependence(spark, str(tmp_path)).collect()[0]
    assert r["upper_tail_dep"] == 0.0, r
    assert r["lower_tail_dep"] == 0.0, r

    # independence: a full grid -> P(y extreme | x extreme) ~ 1 - q
    rows = [(float(i), float(j)) for i in range(40) for j in range(40)]
    _write_li(spark, tmp_path, rows)
    r = stat_tail_dependence(spark, str(tmp_path)).collect()[0]
    assert 0.01 <= r["upper_tail_dep"] <= 0.12, r
    assert 0.01 <= r["lower_tail_dep"] <= 0.12, r


def _write_daily_events(spark, tmp_path, per_day):
    rows = []
    eid = 0
    for day, n in enumerate(per_day):
        for _ in range(n):
            rows.append((eid, f"2024-01-{day + 1:02d} 12:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_arch_lm_fires_on_volatility_clustering(spark, tmp_path):
    from mister_spark.operators.extras190 import stat_arch_lm

    # calm spell (tiny deviations) then turbulent spell (huge swings):
    # squared residuals are strongly lag-correlated
    calm = [100 + (1 if d % 2 else -1) for d in range(14)]
    wild = [100 + (60 if d % 2 else -60) for d in range(14)]
    _write_daily_events(spark, tmp_path, calm + wild)
    clustered = stat_arch_lm(spark, str(tmp_path)).collect()[0]

    # alternating constant-amplitude swings: s2 is CONSTANT -> no ARCH
    flat = [100 + (30 if d % 2 else -30) for d in range(28)]
    _write_daily_events(spark, tmp_path, flat)
    const = stat_arch_lm(spark, str(tmp_path)).collect()[0]

    assert clustered["t_pairs"] == 27 and const["t_pairs"] == 27
    assert clustered["lm_stat"] > 10, clustered
    assert clustered["lag1_coef"] > 0.5, clustered
    assert const["lm_stat"] < 3, const
