"""Wave 227 behavior gates beyond the registry oracle parity.

ASO must read clean dominance as ratio 0, reversed dominance as
ratio 1, and exchangeable groups as ~0.5; first-passage times must
match hand-solved values on a two-state chain and respect funnel
asymmetry on a planted journey.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_aso_reads_dominance_direction(spark, tmp_path):
    from mister_spark.operators.extras227 import stat_almost_stochastic_order

    # A ('1') strictly larger than B ('5'): clean dominance, ratio 0
    rows = [("1-U", 90000.0 + 600.0 * (i % 7)) for i in range(150)] + [
        ("5-L", 30000.0 + 600.0 * (i % 7)) for i in range(150)
    ]
    _write_orders(spark, tmp_path, rows)
    r = stat_almost_stochastic_order(spark, str(tmp_path)).collect()[0]
    assert r["violation_ratio"] == 0.0, r
    assert r["w1_distance"] > 50000, r

    # reversed: every violation
    rows = [("1-U", 30000.0 + 600.0 * (i % 7)) for i in range(150)] + [
        ("5-L", 90000.0 + 600.0 * (i % 7)) for i in range(150)
    ]
    _write_orders(spark, tmp_path, rows)
    r = stat_almost_stochastic_order(spark, str(tmp_path)).collect()[0]
    assert r["violation_ratio"] == 1.0, r

    # crossing CDFs: A bimodal 30k/90k, B all at 60k -> the gap
    # splits exactly half violating, half conforming
    rows = (
        [("1-U", 30000.0) for _ in range(75)]
        + [("1-U", 90000.0) for _ in range(75)]
        + [("5-L", 60000.0) for _ in range(150)]
    )
    _write_orders(spark, tmp_path, rows)
    r = stat_almost_stochastic_order(spark, str(tmp_path)).collect()[0]
    assert r["violation_ratio"] == 0.5, r


def _write_user_events(spark, tmp_path, transitions):
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    for uid, seq in transitions:
        for k2, etype in enumerate(seq):
            ts = (d0 + datetime.timedelta(minutes=k2)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts, uid, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string",
        )
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_first_passage_matches_two_state_closed_form(spark, tmp_path):
    from mister_spark.operators.extras227 import ev_markov_first_passage

    # two states with P(a->b)=0.25, P(a->a)=0.75, P(b->a)=1:
    # E[a->b] = 1/0.25 = 4; E[b->a] = 1
    seqs = []
    for u in range(40):
        # each user contributes one a->? transition: 10 a->b, 30 a->a
        seqs.append((u, ["a", "b" if u % 4 == 0 else "a"]))
    for u in range(40, 60):
        seqs.append((u, ["b", "a"]))
    _write_user_events(spark, tmp_path, seqs)
    out = {
        (r["from_type"], r["to_type"]): r["expected_steps"]
        for r in ev_markov_first_passage(spark, str(tmp_path)).collect()
    }
    assert abs(out[("a", "b")] - 4.0) < 0.01, out
    assert out[("b", "a")] == 1.0, out

    # funnel asymmetry: view->click->purchase mostly forward;
    # purchase rarely returns -> E[purchase->view] >> E[view->purchase]
    seqs = []
    for u in range(100, 140):
        seqs.append((u, ["view", "click", "purchase", "view"]))
    for u in range(140, 160):
        seqs.append((u, ["view", "view", "click", "click", "purchase"]))
    _write_user_events(spark, tmp_path, seqs)
    out = {
        (r["from_type"], r["to_type"]): r["expected_steps"]
        for r in ev_markov_first_passage(spark, str(tmp_path)).collect()
    }
    assert out[("view", "purchase")] < out[("purchase", "view")] + 5, out
    assert out[("view", "purchase")] > 1.5, out
