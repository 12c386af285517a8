"""Wave 233 behavior gates beyond the registry oracle parity.

The homoglyph audit must read clean ASCII as provable zeros and
surface planted Cyrillic confusables and zero-width splits; the
exact rate test must match the binomial closed form on a tiny
hand-checkable case and read balanced rates as p ~ 1.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_homoglyph_audit_flags_planted_confusables(spark, tmp_path):
    from mister_spark.operators.extras233 import tx_homoglyph_audit

    clean = " ".join(f"word{i}" for i in range(30))
    _write_docs(spark, tmp_path, [(i, clean) for i in range(10)])
    r = tx_homoglyph_audit(spark, str(tmp_path)).collect()[0]
    assert r["mixed_script_tokens"] == 0, r
    assert r["zero_width_tokens"] == 0, r
    assert r["flagged_docs"] == 0, r

    # doc 10: 'pаypal' with Cyrillic а (U+0430); doc 11: zero-width
    # space inside a token; doc 12 clean
    spoof = "visit pаypal now"
    zw = "free mon​ey here"
    _write_docs(
        spark, tmp_path, [(10, spoof), (11, zw), (12, clean)]
    )
    r = tx_homoglyph_audit(spark, str(tmp_path)).collect()[0]
    assert r["mixed_script_tokens"] == 1, r
    assert r["zero_width_tokens"] == 1, r
    assert r["flagged_docs"] == 2, r


def _write_daily_events(spark, tmp_path, day_counts, start):
    rows, eid = [], 0
    for day, n in enumerate(day_counts):
        d = (start + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 13:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )

def test_exact_rate_test_reads_ratio_and_balance(spark, tmp_path):
    from mister_spark.operators.extras233 import stat_poisson_rate_exact

    sat = datetime.date(2024, 1, 6)  # epoch%7 == 2 (weekend bucket)
    # 2 weekend days at 15/day, 5 weekdays at 5/day: ratio 3
    _write_daily_events(spark, tmp_path, [15, 15, 5, 5, 5, 5, 5], sat)
    r = stat_poisson_rate_exact(spark, str(tmp_path)).collect()[0]
    assert r["weekend_events"] == 30 and r["weekend_days"] == 2, r
    assert r["weekday_events"] == 25 and r["weekday_days"] == 5, r
    assert r["rate_ratio"] == 3.0, r
    assert r["p_value"] < 0.001, r

    # balanced rates: p near 1
    _write_daily_events(spark, tmp_path, [10] * 7, sat)
    r = stat_poisson_rate_exact(spark, str(tmp_path)).collect()[0]
    assert r["rate_ratio"] == 1.0, r
    assert r["p_value"] > 0.5, r
