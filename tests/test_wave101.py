"""Wave 101 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras101 import AP_SUP

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_apriori_downward_closure(spark):
    rows = registry.QUERIES["ml_apriori_itemsets"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    singles = {}
    for r in registry.QUERIES["ml_apriori_itemsets"](spark, SF).collect():
        if r["size"] == 1:
            singles[r["itemset"]] = r["sup"]
        assert r["sup"] >= AP_SUP
    # support monotonicity: any reported pair's support cannot exceed
    # either member single's support (when the single made top-20)
    for r in rows:
        if r["size"] == 2:
            a, b = r["itemset"].split(",")
            for m in (a, b):
                if m in singles:
                    assert r["sup"] <= singles[m]


def test_bloom_filter_bytes(spark):
    r = registry.QUERIES["io_parquet_bloom_filters"](spark, SF).collect()[0]
    assert r["rows_plain"] == r["rows_bloom"]  # lossless
    # the bloom bitset must actually land in the file
    assert r["extra_bytes"] > 1000
    assert r["size_ratio"] > 1.01


def test_length_cap_policy(spark):
    r = registry.QUERIES["ds_length_cap_policy"](spark, SF).collect()[0]
    assert r["cap_tokens"] > 0
    assert r["tokens_after"] <= r["tokens_before"]
    assert 0 <= r["tokens_saved_share"] < 0.5
    # P95 cap: at most ~5% of docs are truncated
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r["docs_truncated"] <= docs * 0.06 + 1
