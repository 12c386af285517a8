"""Wave 95 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_logrank_aa_split(spark):
    r = registry.QUERIES["stat_logrank_test"](spark, SF).collect()[0]
    assert r["na"] + r["nb"] > 0
    assert r["logrank_var"] > 0
    # user_id parity is an A/A split: the test must NOT reject
    assert abs(r["z"]) < 2.5


def test_bitemporal_corrections_visible(spark):
    rows = registry.QUERIES["scd_bitemporal_asof"](spark, SF).collect()
    assert len(rows) == 5  # all priorities present
    total = sum(r["total"] for r in rows)
    n = sum(r["orders"] for r in rows)
    assert n > 0 and total > 0
    # replay: the as-of total must exceed the uncorrected total over
    # the same valid window (corrections are strictly upward) but by
    # less than the full 10% (only keys %10==0, only tx-visible ones)
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderdate").cast("date") <= F.lit("1998-01-01").cast("date")
    )
    base = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert base < total < base * 1.02


def test_quantile_regression_coverage(spark):
    rows = registry.QUERIES["ml_quantile_regression"](spark, SF).collect()
    assert len(rows) == 7
    d = spark.read.parquet(f"{SF}/orders.parquet")
    for r in rows:
        assert r["pinball"] > 0
        # the q90 prediction must cover ~90% of its own group
        dw = (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("bigint")
        grp = d.filter(dw == r["dw"])
        n = grp.count()
        below = grp.filter(F.col("o_totalprice") <= r["q90_pred"]).count()
        assert below >= 0.9 * n - 1
        assert below <= 0.9 * n + max(3, 0.05 * n)
