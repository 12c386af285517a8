"""Wave 78 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_mann_kendall_outputs(spark):
    r = registry.QUERIES["stat_mann_kendall"](spark, SF).collect()[0]
    assert r["n_days"] > 10
    assert 0.0 <= r["p_value"] <= 1.0
    # S and Sen's slope agree in sign (both measure the same trend)
    if r["s_stat"] != 0 and abs(r["sen_slope"]) > 1e-9:
        assert (r["s_stat"] > 0) == (r["sen_slope"] > 0)


def test_markov_attribution_credit(spark):
    rows = registry.QUERIES["ev_markov_attribution"](spark, SF).collect()
    assert len(rows) == 4
    total = sum(r["credit_share"] for r in rows)
    assert abs(total - 1.0) < 0.01
    base = {r["base_conversion"] for r in rows}
    assert len(base) == 1
    b = base.pop()
    assert 0.0 < b <= 1.0
    for r in rows:
        assert 0.0 <= r["removal_effect"] <= b + 1e-6


def test_try_cast_accounting(spark):
    r = registry.QUERIES["sql_try_cast"](spark, SF).collect()[0]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert r["n_rows"] == n_orders
    # every 7th orderkey is dirty
    from pyspark.sql import functions as F

    dirty = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 7 == 0)
        .count()
    )
    assert r["n_unparseable"] == dirty
    assert r["parsed_total"] > 0
