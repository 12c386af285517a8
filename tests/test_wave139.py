"""Wave 139 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_skyline_is_pareto(spark):
    rows = registry.QUERIES["sql_skyline_2d"](spark, SF).collect()
    assert rows
    # no skyline point may dominate another (both strictly better)
    for a in rows:
        for b in rows:
            if a["o_orderkey"] == b["o_orderkey"]:
                continue
            assert not (
                a["price"] > b["price"] and a["day"] > b["day"]
            ), (a, b)
    # the global max-price order is always on the frontier
    import pyspark.sql.functions as F

    top = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .orderBy(F.col("o_totalprice").desc())
        .first()
    )
    assert any(r["o_orderkey"] == top["o_orderkey"] for r in rows)


def test_randomized_response_debias(spark):
    r = registry.QUERIES["ds_randomized_response"](spark, SF).collect()[0]
    assert r["respondents"] > 0
    # the observed rate is pushed toward 0.5 by the coin
    assert abs(r["observed_rate"] - 0.5) <= abs(r["true_rate"] - 0.5) + 0.05
    # debiasing must land near the truth (within sampling noise)
    assert abs(r["debiased_estimate"] - r["true_rate"]) < 0.15
