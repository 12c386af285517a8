"""Wave 73 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_adaboost_rounds(spark):
    rows = sorted(
        registry.QUERIES["ml_adaboost_stumps"](spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert len(rows) == 5
    for r in rows:
        # a chosen stump always beats random guessing on the weighted set
        assert r["weighted_err"] < 0.5
        assert r["alpha"] > 0
        assert 0.0 <= r["train_acc"] <= 1.0
    # the ensemble ends at least as good as its first round (slack for
    # the tiny weak-feature corpus)
    assert rows[-1]["train_acc"] >= rows[0]["train_acc"] - 0.02


def test_parameterized_sql_matches_literal(spark):
    from pyspark.sql import functions as F

    got = registry.QUERIES["sql_parameterized"](spark, SF)
    lit = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter((F.col("o_totalprice") > 250000) & (F.col("o_orderstatus") == "O"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)) / 100).alias(
                "revenue"
            ),
        )
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in lit.collect()}
    assert a == b


def test_feature_shapley_efficiency(spark):
    rows = registry.QUERIES["ml_feature_shapley"](spark, SF).collect()
    assert len(rows) == 3
    gains = {r["total_gain"] for r in rows}
    assert len(gains) == 1
    total = sum(r["shapley_acc"] for r in rows)
    # efficiency axiom: Shapley credits sum to v(full) - v(empty)
    assert abs(total - gains.pop()) < 0.002
