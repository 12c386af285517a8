"""Wave 241 behavior gates beyond the registry oracle parity.

The Chinchilla allocator must scale epochs with compute and match
the closed form on a known token supply; the last-digit screen must
pass organic spread and fire on a round-number fabrication profile.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_chinchilla_allocator_matches_closed_form(spark, tmp_path):
    from mister_spark.operators.extras241 import (
        CHIN_BUDGETS,
        CHIN_FLOPS_PER,
        CHIN_RATIO,
        ds_chinchilla_allocator,
    )

    # 1000 docs x 100 tokens = 100k tokens
    doc = " ".join(f"t{i}" for i in range(100))
    _write_docs(spark, tmp_path, [(i, doc) for i in range(1000)])
    out = {r["flops_budget"]: r for r in ds_chinchilla_allocator(spark, str(tmp_path)).collect()}
    assert len(out) == 3
    for c in CHIN_BUDGETS:
        r = out[float(c)]
        d_opt = math.sqrt(c * CHIN_RATIO / CHIN_FLOPS_PER)
        assert abs(r["corpus_tokens_m"] - 0.1) < 0.01, r
        assert abs(r["epochs_needed"] - d_opt / 1e5) / (d_opt / 1e5) < 0.01
        assert r["single_epoch_ok"] == (1 if d_opt <= 1e5 else 0), r
    # epochs scale as sqrt(C): each 100x budget = 10x epochs
    e = [out[float(c)]["epochs_needed"] for c in CHIN_BUDGETS]
    assert 8 < e[1] / e[0] < 12 and 8 < e[2] / e[1] < 12, e


def _write_orders(spark, tmp_path, prices):
    spark.createDataFrame(
        [(p,) for p in prices], "o_totalprice double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_last_digit_screen_reads_fabrication(spark, tmp_path):
    from mister_spark.operators.extras241 import stat_last_digit_uniformity

    # organic: cent digits cycle uniformly 0..9
    prices = [100.0 + i * 0.01 for i in range(2000)]
    _write_orders(spark, tmp_path, prices)
    r = stat_last_digit_uniformity(spark, str(tmp_path)).collect()[0]
    assert r["n_values"] == 2000, r
    assert r["chi2"] == 0.0, r
    assert r["p_value"] > 0.5, r

    # fabricated: 70% of amounts end in 0 cents, 20% in 5
    prices = []
    for i in range(2000):
        m = i % 10
        if m < 7:
            prices.append(100.0 + i)  # .00
        elif m < 9:
            prices.append(100.05 + i)  # .05
        else:
            prices.append(100.0 + i + (i % 7 + 1) * 0.01)
    _write_orders(spark, tmp_path, prices)
    r = stat_last_digit_uniformity(spark, str(tmp_path)).collect()[0]
    assert r["chi2"] > 500, r
    assert r["p_value"] < 1e-6, r
    assert r["most_common_digit"] == 0, r
