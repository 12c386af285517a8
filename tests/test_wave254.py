"""Wave 254 behavior gates beyond the registry oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cliff_delta_reconciles_with_brute_force(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat

    r = registry.QUERIES["stat_cliff_delta"](spark, SF).collect()[0]
    # pair identities: gt + lt + ties == n1 * n2, delta in [-1, 1]
    assert r["gt"] + r["lt"] + r["ties"] == r["n1"] * r["n2"]
    assert -1.0 <= r["delta"] <= 1.0
    # brute-force on the small SF: exact gt/lt via a cross join
    v = cat(spark, SF)["orders"].select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("g"),
        F.col("o_totalprice").alias("x"),
    )
    a = v.filter("g = 1").select(F.col("x").alias("xa"))
    b = v.filter("g = 0").select(F.col("x").alias("xb"))
    gt = a.crossJoin(b).filter("xa > xb").count()
    lt = a.crossJoin(b).filter("xa < xb").count()
    assert (r["gt"], r["lt"]) == (gt, lt)


def test_hosmer_lemeshow_bins(spark):
    rows = registry.QUERIES["stat_hosmer_lemeshow"](spark, SF).collect()
    assert len(rows) == 10
    chi = rows[0]["hl_chi2"]
    assert all(r["hl_chi2"] == chi for r in rows) and chi >= 0
    assert all(r["df"] == 8 for r in rows)
    # deciles are monotone in observed rate for a separated score
    rates = [r["obs_rate"] for r in sorted(rows, key=lambda r: r["bin"])]
    assert rates[0] < 0.3 and rates[-1] > 0.7
    for r in rows:
        assert 0 <= r["obs"] <= r["n"]
        assert 0 <= r["expected"] <= r["n"]


def test_temperature_scaling_improves_nll(spark):
    r = registry.QUERIES["ml_temperature_scaling"](spark, SF).collect()[0]
    assert r["temperature"] > 0
    assert r["nll_after"] <= r["nll_before"] + 1e-9  # fit can't be worse
    assert r["n"] > 0
