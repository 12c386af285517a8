"""Wave 204 behavior gates beyond the registry oracle parity.

The multinomial NB must hit 100% held-out accuracy on separable
vocabularies and beat the majority baseline; Cox must put a large,
significant hazard ratio on a covariate that halves time-to-purchase
and stay insignificant under a null coupling.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_documents(spark, tmp_path, docs):
    rows = [(i, text, lang) for i, (text, lang) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )


def test_multinomial_nb_separates_disjoint_vocabularies(spark, tmp_path):
    from mister_spark.operators.extras204 import ml_multinomial_nb

    en = ["the cat sat on the mat", "a dog and the cat", "the mat sat"]
    fr = ["le chat dort sur le tapis", "un chien et le chat", "le tapis"]
    docs = []
    for i in range(30):
        docs.append((en[i % 3], "en"))
        docs.append((fr[i % 3], "fr"))
    _write_documents(spark, tmp_path, docs)
    r = ml_multinomial_nb(spark, str(tmp_path)).collect()[0]
    assert r["n_train"] + r["n_test"] == 60, r
    assert r["accuracy"] == 1.0, r
    assert r["accuracy"] > r["majority_baseline"], r


def test_multinomial_nb_degenerates_to_prior_on_identical_text(
    spark, tmp_path
):
    from mister_spark.operators.extras204 import ml_multinomial_nb

    # identical text everywhere: likelihoods cancel, argmax = the
    # majority prior (lang tie-break), so accuracy == majority share
    docs = [("same words here", "en")] * 40 + [
        ("same words here", "fr")
    ] * 20
    _write_documents(spark, tmp_path, docs)
    r = ml_multinomial_nb(spark, str(tmp_path)).collect()[0]
    assert r["accuracy"] == r["majority_baseline"], r


def _write_user_events(spark, tmp_path, user_days):
    """user_days: list of (user_id, [(day, event_type), ...])."""
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for uid, evs in user_days:
        for day, etype in evs:
            ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
            rows.append((eid, ts, uid, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long,"
            " event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_cox_ph_flags_engagement_that_speeds_conversion(spark, tmp_path):
    from mister_spark.operators.extras204 import ml_cox_ph

    users = []
    for i in range(60):
        if i % 10 == 9:  # never purchases: censored at the horizon
            users.append((i, [(0, "click"), (12, "view")]))
        elif i % 2 == 0:  # engaged day one -> buys early (days 1-5)
            users.append(
                (i, [(0, "click"), (0, "view"), (1 + i % 5, "purchase")])
            )
        else:  # single-event day one -> buys late (days 3-10),
            # overlapping the engaged range so the fit stays finite
            users.append((i, [(0, "click"), (3 + i % 8, "purchase")]))
    _write_user_events(spark, tmp_path, users)
    r = ml_cox_ph(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 60 and r["n_events"] == 54, r
    assert r["beta"] > 0.8 and r["hazard_ratio"] > 2.2, r
    assert r["p_value"] < 0.05, r


def test_cox_ph_reads_null_when_groups_convert_alike(spark, tmp_path):
    from mister_spark.operators.extras204 import ml_cox_ph

    users = []
    for i in range(60):
        delay = 1 + hashlib.md5(f"cx:{i}".encode()).digest()[0] % 8
        evs = [(0, "click")]
        if i % 2 == 0:  # engaged flag, same conversion law
            evs.append((0, "view"))
        evs.append((delay, "purchase"))
        users.append((i, evs))
    _write_user_events(spark, tmp_path, users)
    r = ml_cox_ph(spark, str(tmp_path)).collect()[0]
    assert abs(r["z"]) < 2.0 and r["p_value"] > 0.05, r
