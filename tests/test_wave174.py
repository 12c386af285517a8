"""Wave 174 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_croston_rates(spark):
    from mister_spark.operators.extras174 import CR_ALPHA, CR_TOP

    rows = registry.QUERIES["ev_croston"](spark, SF).collect()
    assert len(rows) == CR_TOP
    for r in rows:
        # intervals are >= 1 day, sizes positive, SBA strictly deflates
        assert r["interval_hat"] >= 1.0
        assert r["size_hat"] > 0
        assert 0 < r["sba_rate"] < r["croston_rate"]
        assert (
            abs(r["sba_rate"] - r["croston_rate"] * (1 - CR_ALPHA / 2))
            < 0.001
        )
    # reported brands are the busiest, descending
    days = [r["demand_days"] for r in rows]
    assert days == sorted(days, reverse=True)


def test_croston_ses_matches_recursive_form(spark):
    """The closed-form weighted sum must equal the textbook recursion
    s_i = alpha*v_i + (1-alpha)*s_{i-1} replayed in Python for one
    brand."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras174 import CR_ALPHA

    rows = registry.QUERIES["ev_croston"](spark, SF).collect()
    brand = rows[0]["brand"]
    li = Catalog(spark, SF)["lineitem"]
    p = Catalog(spark, SF)["part"]
    d = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(F.col("p_brand") == brand)
        .groupBy("l_shipdate")
        .agg(F.sum("l_quantity").alias("z"))
        .orderBy("l_shipdate")
        .collect()
    )
    s = float(d[0]["z"])
    for r in d[1:]:
        s = CR_ALPHA * float(r["z"]) + (1 - CR_ALPHA) * s
    assert abs(rows[0]["size_hat"] - s) < 0.001, (rows[0]["size_hat"], s)


def test_jm_sweep_shape(spark):
    from mister_spark.operators.extras174 import JM_LAMBDAS

    rows = registry.QUERIES["tx_jm_interpolation"](spark, SF).collect()
    assert [r["lambda"] for r in rows] == list(JM_LAMBDAS)
    # same held-out pairs for every lambda
    assert len({r["eval_pairs"] for r in rows}) == 1
    assert sum(r["best"] for r in rows) >= 1
    # the best lambda has the minimum reported NLL
    mn = min(r["heldout_nll"] for r in rows)
    for r in rows:
        assert (r["best"] == 1) == (r["heldout_nll"] == mn)
