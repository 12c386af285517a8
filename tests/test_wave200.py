"""Wave 200 behavior gates beyond the registry oracle parity.

Anderson-Darling must accept a binomial-ish (near-normal) volume
series and reject a heavy-tailed one; the Poisson trend fit must
recover a known exponential growth rate and read flat on level noise.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, per_day, event_type="purchase"):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts, event_type))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def _bytes(tag, d, k):
    return hashlib.md5(f"{tag}:{d}".encode()).digest()[:k]


def test_anderson_darling_separates_normal_from_heavy_tail(spark, tmp_path):
    from mister_spark.operators.extras200 import stat_anderson_darling

    # sum of 16 uniform bytes: CLT-normal enough for n=100
    _write_daily_events(
        spark,
        tmp_path,
        [200 + sum(_bytes("adn", d, 16)) for d in range(100)],
    )
    r = stat_anderson_darling(spark, str(tmp_path)).collect()[0]
    assert r["normality_rejected"] == 0, r
    normal_stat = r["a2_star"]

    # squared byte: strongly right-skewed, AD's tail weight fires
    _write_daily_events(
        spark,
        tmp_path,
        [
            5 + _bytes("adh", d, 1)[0] ** 2 // 64
            for d in range(100)
        ],
    )
    r = stat_anderson_darling(spark, str(tmp_path)).collect()[0]
    assert r["normality_rejected"] == 1, r
    assert r["a2_star"] > normal_stat, (normal_stat, r)


def test_poisson_regression_recovers_growth_rate(spark, tmp_path):
    from mister_spark.operators.extras200 import ml_poisson_regression

    # counts growing 3%/day: beta1 -> ln(1.03), rate ratio -> 1.03
    per_day = [round(50 * math.exp(0.03 * d)) for d in range(80)]
    _write_daily_events(spark, tmp_path, per_day)
    r = ml_poisson_regression(spark, str(tmp_path)).collect()[0]
    assert abs(r["rate_ratio_per_day"] - 1.03) < 0.005, r
    assert r["pseudo_r2"] > 0.95, r

    # level noise: no trend, tiny rate ratio deviation, low pseudo-R2
    _write_daily_events(
        spark,
        tmp_path,
        [60 + _bytes("pzn", d, 1)[0] % 20 for d in range(80)],
    )
    r = ml_poisson_regression(spark, str(tmp_path)).collect()[0]
    assert abs(r["rate_ratio_per_day"] - 1.0) < 0.01, r
    assert r["pseudo_r2"] < 0.2, r
