"""Wave 193 behavior gates beyond the registry oracle parity.

Keyness must rank the planted group-exclusive tokens first with the
right direction and score shared tokens ~0; Viterbi must decode a
planted calm->turbulent regime change and stay all-calm on a flat
series.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, docs):
    """docs: list of (lang, text)."""
    rows = [(i, t, lang, "src0", len(t)) for i, (lang, t) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )


def test_keyness_ranks_group_exclusive_tokens(spark, tmp_path):
    from mister_spark.operators.extras193 import tx_keyness

    en = [("en", "alpha common filler" + " alpha" * 5)] * 6
    de = [("de", "beta common filler" + " beta" * 5)] * 6
    _write_docs(spark, tmp_path, en + de)
    rows = tx_keyness(spark, str(tmp_path)).collect()
    by_tok = {r["token"]: r for r in rows}
    assert "alpha" in by_tok and "beta" in by_tok
    assert by_tok["alpha"]["enriched_in"] == "en"
    assert by_tok["beta"]["enriched_in"] == "rest"
    # the two exclusive tokens dominate the ranking
    top2 = {rows[0]["token"], rows[1]["token"]}
    assert top2 == {"alpha", "beta"}, rows[:3]
    # perfectly shared tokens carry ~zero keyness
    assert by_tok["common"]["g2"] < 0.01, by_tok["common"]


def _write_daily_events(spark, tmp_path, per_day):
    rows = []
    eid = 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_viterbi_decodes_the_regime_change(spark, tmp_path):
    from mister_spark.operators.extras193 import ml_hmm_viterbi

    # 20 calm days (low volume) then 10 turbulent days (high volume):
    # the decoded path should be the 10-day turbulent block
    _write_daily_events(spark, tmp_path, [50] * 20 + [200] * 10)
    r = ml_hmm_viterbi(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 30, r
    assert r["turbulent_days"] == 10, r
    assert r["longest_turbulent_run"] == 10, r
    assert r["viterbi_logprob"] < 0, r

    # flat series: no day exceeds the mean -> all-calm decode
    _write_daily_events(spark, tmp_path, [100] * 30)
    r = ml_hmm_viterbi(spark, str(tmp_path)).collect()[0]
    assert r["turbulent_days"] == 0, r
    assert r["longest_turbulent_run"] == 0, r
