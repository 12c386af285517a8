"""Wave 247 behavior gates beyond the registry oracle parity.

c-TF-IDF must surface each source's distinctive vocabulary above the
shared stopword; the Friedman test must call a planted consistent
volume ordering and stay quiet when every type ties every day.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )


def test_ctfidf_names_each_source(spark, tmp_path):
    from mister_spark.operators.extras247 import tx_ctfidf

    docs = []
    for i in range(10):
        docs.append((i, "fruit", "the apple banana apple the"))
        docs.append((100 + i, "veg", "the carrot daikon carrot the"))
    _write_docs(spark, tmp_path, docs)
    rows = tx_ctfidf(spark, str(tmp_path)).collect()
    top = {
        r["source"]: r["term"] for r in rows if r["rank"] == 1
    }
    assert top["fruit"] == "apple"
    assert top["veg"] == "carrot"
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["term"]] = r["ctfidf"]
    # the shared stopword scores below the distinctive terms everywhere
    for src, terms in by_src.items():
        assert terms["the"] < max(terms.values()), (src, terms)


def _write_events(spark, tmp_path, day_counts):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for etype, counts in day_counts.items():
        for day, c in enumerate(counts):
            d = (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
            for _ in range(c):
                rows.append((eid, f"{d} 12:00:00", etype))
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


def test_friedman_calls_consistent_ordering(spark, tmp_path):
    from mister_spark.operators.extras247 import stat_friedman_test

    # A always beats B beats C, with day-level noise in the LEVELS —
    # exactly the day effect that fools a means test but not ranks
    a = [30 + 10 * (d % 3) for d in range(12)]
    b = [20 + 10 * (d % 3) for d in range(12)]
    c = [10 + 10 * (d % 3) for d in range(12)]
    _write_events(spark, tmp_path, {"alpha": a, "beta": b, "gamma": c})
    out = {r["event_type"]: r for r in stat_friedman_test(spark, str(tmp_path)).collect()}
    assert out["alpha"]["mean_rank"] == 3.0
    assert out["beta"]["mean_rank"] == 2.0
    assert out["gamma"]["mean_rank"] == 1.0
    assert out["alpha"]["p_value"] < 0.001, out["alpha"]
    # Q for a perfect ordering with n=12, k=3: 12n(k-1)... = 2n
    assert out["alpha"]["q_stat"] == 24.0, out["alpha"]


def test_friedman_all_ties_is_quiet(spark, tmp_path):
    from mister_spark.operators.extras247 import stat_friedman_test

    flat = [7] * 10
    _write_events(
        spark, tmp_path, {"alpha": flat, "beta": flat, "gamma": flat}
    )
    out = stat_friedman_test(spark, str(tmp_path)).collect()
    assert all(r["q_stat"] == 0.0 for r in out)
    assert all(r["mean_rank"] == 2.0 for r in out)
    assert all(r["p_value"] > 0.5 for r in out)
