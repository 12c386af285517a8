"""Wave 213 behavior gates beyond the registry oracle parity.

DFA's alpha must read ~1.5 on an integrated random walk and clearly
lower on its shuffled (memoryless) counterpart; the DGIM closed form
must match a faithful streaming simulation of the textbook algorithm
bucket-for-bucket, and its estimate must respect the 50% error bound.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(day_counts):
        d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 12:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def _hash_steps(n, seed):
    # deterministic +/-1 steps
    return [
        1 if hashlib.md5(f"{seed}:{i}".encode()).digest()[0] < 128 else -1
        for i in range(n)
    ]


def test_dfa_separates_walk_from_shuffled_noise(spark, tmp_path):
    from mister_spark.operators.extras213 import ev_dfa

    steps = _hash_steps(60, "dfa")
    # integrated walk: counts follow a random walk (persistent)
    level, walk = 50, []
    for s in steps:
        level += 3 * s
        walk.append(max(level, 5))
    _write_daily_events(spark, tmp_path, walk)
    rows = ev_dfa(spark, str(tmp_path)).collect()
    alpha_walk = rows[0]["alpha"]
    assert len(rows) == 4 and all(r["alpha"] == alpha_walk for r in rows)

    # same counts, shuffled deterministically: memory destroyed
    order = sorted(
        range(60),
        key=lambda i: hashlib.md5(f"sh:{i}".encode()).hexdigest(),
    )
    _write_daily_events(spark, tmp_path, [walk[i] for i in order])
    alpha_shuf = ev_dfa(spark, str(tmp_path)).collect()[0]["alpha"]
    assert alpha_walk > 1.0, (alpha_walk, alpha_shuf)
    assert alpha_shuf < alpha_walk - 0.3, (alpha_walk, alpha_shuf)


def _simulate_dgim(one_hours, window):
    """Textbook streaming DGIM: buckets as (timestamp, size), merge
    the two oldest whenever a size has three."""
    buckets = []  # newest first
    for h in sorted(one_hours):
        buckets.insert(0, (h, 1))
        size = 1
        while sum(1 for _, s in buckets if s == size) > 2:
            # merge the two OLDEST buckets of this size
            idxs = [i for i, (_, s) in enumerate(buckets) if s == size]
            i1, i2 = idxs[-2], idxs[-1]
            ts = buckets[i1][0]  # newer of the two
            buckets[i1] = (ts, size * 2)
            del buckets[i2]
            size *= 2
    t_now = max(one_hours)
    cutoff = t_now - window + 1
    kept = [(ts, s) for ts, s in buckets if ts >= cutoff]
    if not kept:
        return [], 0.0
    est = sum(s for _, s in kept) - kept[-1][1] / 2
    return kept, est


def test_dgim_closed_form_matches_streaming_simulation(spark, tmp_path):
    from mister_spark.operators.extras213 import DGIM_WINDOW, sketch_dgim

    # sparse-ish activity: ~37% of hours active over 1200 hours
    d0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    one_hours, rows, eid = [], [], 0
    for i in range(1200):
        if hashlib.md5(f"dg:{i}".encode()).digest()[0] < 95:
            ts = (d0 + datetime.timedelta(hours=i)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts))
            eid += 1
            one_hours.append(i + 473364)  # hours since epoch for 2024-01-01
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )
    r = sketch_dgim(spark, str(tmp_path)).collect()[0]
    kept, est = _simulate_dgim(one_hours, DGIM_WINDOW)
    assert r["m_total_ones"] == len(one_hours), r
    assert r["n_buckets"] == len(kept), (r, kept)
    assert abs(r["est_count"] - est) < 0.11, (r["est_count"], est)
    true = sum(1 for h in one_hours if h >= max(one_hours) - DGIM_WINDOW + 1)
    assert r["true_count"] == true, r
    # DGIM guarantee: off by at most half the oldest kept bucket
    assert r["rel_error"] <= 0.5, r
    # and with ~2 buckets/size the practical error is small
    assert r["rel_error"] < 0.2, r
