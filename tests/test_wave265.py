"""Wave 265 behavior gates beyond oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.01"


def test_langid_eval_matrix_accounting(spark):
    rows = registry.QUERIES["tx_langid_eval"](spark, SF).collect()
    langs = {r["true_lang"] for r in rows}
    assert "zh" in langs  # the out-of-profile class is present
    # zh can never be predicted (not in the profile table)
    assert all(r["pred_lang"] != "zh" for r in rows)
    # rows of each true class sum to 1 on the share grid
    from collections import defaultdict

    share = defaultdict(float)
    n_docs = 0
    for r in rows:
        share[r["true_lang"]] += r["share_of_true"]
        n_docs += r["n"]
        assert r["is_correct"] == int(r["true_lang"] == r["pred_lang"])
    for lang, s in share.items():
        assert abs(s - 1.0) < 5e-3, (lang, s)
    assert n_docs == spark.read.parquet(f"{SF}/documents.parquet").count()
    # the classifier must clearly beat 5-class chance on in-profile
    # languages (the en-first tie-break costs recall on es/fr/de, so
    # this is a floor, not a quality claim — measured 0.466 at sf0.01)
    correct = sum(r["n"] for r in rows if r["is_correct"] == 1)
    in_profile = sum(
        r["n"] for r in rows if r["true_lang"] in ("en", "es", "fr", "de")
    )
    assert correct / in_profile > 0.4


def test_variant_roundtrip_totals(spark):
    from pyspark.sql import functions as F

    rows = registry.QUERIES["io_variant_query"](spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["priority"]: r["n_orders"] for r in rows}
    assert got == want
    assert all(r["total_price"] > 0 for r in rows)
