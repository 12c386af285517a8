"""Wave 196 behavior gates beyond the registry oracle parity.

Permutation entropy must read 0 on a monotone series, ln2/ln6 on a
strict alternation, and near 1 on hash noise; RQA must read DET ≈ 1
with a period-length L_max on a strict cycle and lower DET on noise.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, per_day):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_permutation_entropy_reads_shape_complexity(spark, tmp_path):
    from mister_spark.operators.extras196 import stat_permutation_entropy

    # strictly increasing: one ordinal pattern only -> entropy 0
    _write_daily_events(spark, tmp_path, [50 + 2 * d for d in range(40)])
    r = stat_permutation_entropy(spark, str(tmp_path)).collect()[0]
    assert r["n_triples"] == 38 and r["n_patterns"] == 1, r
    assert r["pe"] == 0.0 and r["top_pattern"] == "012", r

    # strict alternation: exactly two patterns, H = ln 2
    _write_daily_events(
        spark, tmp_path, [100 + (30 if d % 2 else -30) for d in range(40)]
    )
    r = stat_permutation_entropy(spark, str(tmp_path)).collect()[0]
    assert r["n_patterns"] == 2, r
    assert abs(r["pe_normalized"] - 0.386853) < 1e-4, r

    # hash noise: most patterns show up, normalized entropy high
    _write_daily_events(
        spark,
        tmp_path,
        [
            50 + hashlib.md5(f"pe:{d}".encode()).digest()[0]
            for d in range(80)
        ],
    )
    r = stat_permutation_entropy(spark, str(tmp_path)).collect()[0]
    assert r["n_patterns"] >= 5, r
    assert r["pe_normalized"] > 0.8, r


def test_rqa_separates_cycle_from_noise(spark, tmp_path):
    from mister_spark.operators.extras196 import (
        ev_recurrence_quantification,
    )

    # strict period-5 cycle with well-separated levels: every
    # recurrence continues diagonally -> DET ~ 1, L_max large
    cycle = [50, 120, 200, 90, 160]
    _write_daily_events(spark, tmp_path, [cycle[d % 5] for d in range(40)])
    r = ev_recurrence_quantification(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 40, r
    assert r["det"] > 0.95, r
    assert r["l_max"] >= 30, r

    # hash noise: many recurrences are isolated points
    _write_daily_events(
        spark,
        tmp_path,
        [
            50 + hashlib.md5(f"rq:{d}".encode()).digest()[0]
            for d in range(40)
        ],
    )
    rn = ev_recurrence_quantification(spark, str(tmp_path)).collect()[0]
    assert rn["det"] < r["det"], (rn, r)
    assert rn["l_max"] < r["l_max"], (rn, r)
