"""Wave 209 behavior gates beyond the registry oracle parity.

Seasonal MK must read exactly S=0 on a pure weekly sawtooth (which
plain MK misreads as trend) yet fire on drift superimposed on the
same sawtooth; Krippendorff's alpha must read 1 on unanimous raters,
~0 on hash-independent votes, and still compute when one rater
abstains on every item (the case kappa cannot handle).
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


SAW = [100, 40, 45, 50, 55, 60, 120]  # weekly sawtooth profile


def test_seasonal_mk_is_blind_to_the_weekly_cycle(spark, tmp_path):
    from mister_spark.operators.extras209 import ev_seasonal_mann_kendall

    # pure sawtooth repeated 10 weeks: within-weekday series constant
    _write_daily_events(spark, tmp_path, [SAW[d % 7] for d in range(70)])
    r = ev_seasonal_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert r["n_seasons"] == 7 and r["s_stat"] == 0, r
    assert r["z"] == 0.0 and r["seasonal_sen_slope"] == 0.0, r

    # same sawtooth + 2/day drift: every within-weekday pair rises
    _write_daily_events(
        spark, tmp_path, [SAW[d % 7] + 2 * d for d in range(70)]
    )
    r = ev_seasonal_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert r["p_value"] < 0.01 and r["z"] > 3, r
    assert abs(r["seasonal_sen_slope"] - 2.0) < 0.01, r


def _write_documents(spark, tmp_path, docs):
    rows = [
        (i, text, int(n_chars)) for i, (text, n_chars) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )


# token profiles the three raters agree/disagree on:
KEEPY = (
    " ".join(f"tok{i:02d}" for i in range(40))
    + " "
    + " ".join(chr(97) + chr(97 + j) for j in range(14))
)  # 40 distinct long tokens + 14 distinct short ones: short share
# 14/54 >= 22%, distinct share 54/54 >= 55% — all three raters keep
DROPPY = " ".join(["same same same"] * 20)


def test_krippendorff_alpha_reads_agreement_levels(spark, tmp_path):
    from mister_spark.operators.extras209 import stat_krippendorff_alpha

    # unanimous: long diverse docs (all keep) + short repetitive
    # (all drop) -> alpha = 1
    docs = [(KEEPY, 500)] * 12 + [(DROPPY, 100)] * 12
    _write_documents(spark, tmp_path, docs)
    r = stat_krippendorff_alpha(spark, str(tmp_path)).collect()[0]
    assert r["n_items"] == 24 and r["kripp_alpha"] == 1.0, r

    # independent votes: flip each rater's signal by separate hashes
    docs = []
    for i in range(60):
        b1 = hashlib.md5(f"a:{i}".encode()).digest()[0] & 1
        b2 = hashlib.md5(f"b:{i}".encode()).digest()[0] & 1
        b3 = hashlib.md5(f"c:{i}".encode()).digest()[0] & 1
        # r1 from n_chars, r2 from short-token share, r3 from
        # distinct share — independently keep/drop
        n_shorts = 20 if b2 else 2
        body = [f"w{i}x{j}" for j in range(40 if b3 else 4)]
        if not b3:
            body = body * 10  # repetition kills distinct share
        text = " ".join(body + ["of"] * n_shorts)
        docs.append((text, 500 if b1 else 50))
    _write_documents(spark, tmp_path, docs)
    r = stat_krippendorff_alpha(spark, str(tmp_path)).collect()[0]
    assert abs(r["kripp_alpha"]) < 0.3, r

    # one rater abstains everywhere (n_chars inside [180, 220)):
    # alpha still computes from the other two — kappa would need a
    # complete panel
    docs = [(KEEPY, 200)] * 10 + [(DROPPY, 200)] * 10
    _write_documents(spark, tmp_path, docs)
    r = stat_krippendorff_alpha(spark, str(tmp_path)).collect()[0]
    assert r["n_items"] == 20 and r["n_ratings"] == 40, r
    assert r["kripp_alpha"] == 1.0, r
