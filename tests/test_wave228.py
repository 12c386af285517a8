"""Wave 228 behavior gates beyond the registry oracle parity.

OOF stacking must beat both bases when each carries independent
signal and put ~all weight on the only informative base otherwise;
BLEU must read directional containment (copy scores high against
source) that symmetric Jaccard underrates.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate_s string, o_orderpriority string, "
        "o_totalprice double",
    ).select(
        "o_orderkey",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority", "o_totalprice",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_oof_stack_weights_follow_signal(spark, tmp_path):
    from mister_spark.operators.extras228 import ml_oof_stacking

    d0 = datetime.date(2024, 1, 1)
    # additive: weekday contributes 2000/w, priority 5000/g
    rows = []
    for i in range(700):
        day = d0 + datetime.timedelta(days=i % 28)
        w = ((day.weekday()) % 7) + 1
        g = (i % 5) + 1
        rows.append(
            (
                i, day.strftime("%Y-%m-%d"), f"{g}-P",
                2000.0 * w + 5000.0 * g + 37.0 * ((i * 3) % 11),
            )
        )
    _write_orders(spark, tmp_path, rows)
    r = ml_oof_stacking(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 700, r
    # the stack beats both single bases
    assert r["rmse_stack"] < r["rmse_weekday"] - 1, r
    assert r["rmse_stack"] < r["rmse_priority"] - 1, r
    # both weights present and positive
    assert r["weight_weekday"] > 0.5 and r["weight_priority"] > 0.5, r

    # only priority matters: weekday weight collapses
    rows = []
    for i in range(700):
        day = d0 + datetime.timedelta(days=i % 28)
        g = (i % 5) + 1
        rows.append(
            (
                i, day.strftime("%Y-%m-%d"), f"{g}-P",
                5000.0 * g + 37.0 * ((i * 3) % 11),
            )
        )
    _write_orders(spark, tmp_path, rows)
    r = ml_oof_stacking(spark, str(tmp_path)).collect()[0]
    assert r["rmse_priority"] < r["rmse_weekday"] / 3, r
    assert abs(r["weight_weekday"]) < 0.35, r
    assert r["weight_priority"] > 0.8, r


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_bleu_reads_directional_containment(spark, tmp_path):
    from mister_spark.operators.extras228 import tx_bleu_pairs

    src = " ".join(f"w{i}" for i in range(60))
    # doc 1 copies the first 40 tokens of doc 0 and adds nothing:
    # high BLEU vs source, jaccard 40/60 ~ 0.67 (pair survives)
    copy = " ".join(f"w{i}" for i in range(40))
    # docs 2/3: near-identical pair as a control
    a2 = " ".join(f"q{i}" for i in range(50))
    b3 = " ".join(f"q{i}" for i in range(48))
    _write_docs(spark, tmp_path, [(0, src), (1, copy), (2, a2), (3, b3)])
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in tx_bleu_pairs(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in out and (2, 3) in out, out.keys()
    r01 = out[(0, 1)]
    # every copied token/bigram is clipped-present: precision 1.0,
    # brevity penalty exp(1 - 60/40) < 1 bites
    assert r01["precision_1g"] == 1.0 and r01["precision_2g"] == 1.0, r01
    assert 0.55 < r01["bleu2"] < 0.65, r01
    r23 = out[(2, 3)]
    assert r23["bleu2"] > 0.9, r23
