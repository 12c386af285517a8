"""Wave 215 behavior gates beyond the registry oracle parity.

Storey must flag planted brand effects with pi0 < 1 and stay quiet
on a null corpus; AC1 must stay high under skewed prevalence where
kappa collapses (the kappa paradox), and track kappa when the vote
distribution is balanced.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_brands(spark, tmp_path, brand_rows):
    """brand_rows: dict brand -> list of revenue values."""
    parts, li, pk = [], [], 0
    for brand, revs in brand_rows.items():
        pk += 1
        parts.append((pk, brand))
        for r in revs:
            li.append((pk, r, 0.0))
    base = str(tmp_path)
    spark.createDataFrame(parts, "p_partkey long, p_brand string").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "part.parquet"))
    spark.createDataFrame(
        li, "l_partkey long, l_extendedprice double, l_discount double"
    ).write.mode("overwrite").parquet(os.path.join(base, "lineitem.parquet"))


def test_storey_flags_planted_effects_only(spark, tmp_path):
    from mister_spark.operators.extras215 import stat_storey_qvalue

    # symmetric alternatives (5 high at 202, 5 low at 2) so every
    # null brand's complement mean stays exactly 102 = its own mean;
    # all brands n=60 with the same tiny 0..4 cycle variance
    rows = {}
    for b in range(5):
        rows[f"High#{b}"] = [200.0 + (i % 5) for i in range(60)]
        rows[f"Low#{b}"] = [0.0 + (i % 5) for i in range(60)]
    for b in range(5):
        rows[f"Null#{b}"] = [100.0 + ((i + b) % 5) for i in range(60)]
    _write_brands(spark, tmp_path, rows)
    out = {r["brand"]: r for r in stat_storey_qvalue(spark, str(tmp_path)).collect()}
    assert len(out) == 15
    alts = [out[k] for k in out if "Null" not in k]
    nulls = [out[k] for k in out if "Null" in k]
    assert all(r["discovery"] == 1 for r in alts), alts
    assert all(r["discovery"] == 0 for r in nulls), nulls
    # 5 of 15 p-values above lambda=0.5 -> pi0 = 5/7.5 = 2/3
    assert nulls[0]["pi0"] == 0.6667, nulls[0]
    assert min(r["q_value"] for r in nulls) > max(
        r["q_value"] for r in alts
    )


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )


def test_ac1_survives_prevalence_skew_where_kappa_dies(spark, tmp_path):
    from mister_spark.operators.extras215 import stat_gwet_ac1

    # 90% long diverse docs (both raters keep), 5% short diverse
    # (A drops, B keeps), 5% long repetitive (A keeps, B drops):
    # raw agreement 90%, marginals ~95/95
    long_div = " ".join(f"w{i}" for i in range(80))
    short_div = " ".join(f"s{i}" for i in range(10))
    long_rep = " ".join("rep" for _ in range(80))
    texts = [long_div] * 90 + [short_div] * 5 + [long_rep] * 5
    r = None
    _write_docs(spark, tmp_path, texts)
    r = stat_gwet_ac1(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 100 and r["pct_agree"] == 0.9, r
    # the paradox: kappa craters, AC1 stays near raw agreement
    assert r["kappa"] < 0.0, r
    assert r["ac1"] > 0.85, r

    # balanced: half clearly-keep, half clearly-drop (short AND
    # repetitive, so both raters drop), raters agree everywhere
    texts = [long_div] * 50 + ["x x x"] * 50
    _write_docs(spark, tmp_path, texts)
    r = stat_gwet_ac1(spark, str(tmp_path)).collect()[0]
    assert r["pct_agree"] == 1.0, r
    assert r["ac1"] == 1.0 and r["kappa"] == 1.0, r
