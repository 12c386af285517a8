"""Wave 252 behavior gates beyond the registry oracle parity.

Rebuy quantiles must be order statistics of the actual gap multiset;
MI must be nonnegative, symmetric-marginal-consistent, and NMI in
[0, 1]; the Tukey panel must enumerate all pairs with a shared
within-group df and SEs that shrink with group size.
"""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_rebuy_quantiles_are_order_statistics(spark):
    import math

    from pyspark.sql import Window as W, functions as F

    rows = {r["seg"]: r for r in registry.QUERIES["ev_rebuy_interval"](spark, SF).collect()}
    assert len(rows) == 5
    # recompute one segment's gaps brute-force and check the picks
    from mister_spark.operators.common import cat

    c = cat(spark, SF)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        c["orders"]
        .withColumn(
            "gap",
            F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")),
        )
        .filter(F.col("gap").isNotNull())
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .filter(F.col("seg") == "BUILDING")
        .select("gap")
        .collect()
    )
    vals = sorted(r["gap"] for r in gaps)
    r = rows["BUILDING"]
    assert r["n_gaps"] == len(vals)
    assert r["median_days"] == vals[math.ceil(0.5 * len(vals)) - 1]
    assert r["p90_days"] == vals[math.ceil(0.9 * len(vals)) - 1]
    assert abs(r["mean_days"] - sum(vals) / len(vals)) < 1e-3


def test_mutual_info_bounds(spark):
    rows = registry.QUERIES["stat_mutual_info"](spark, SF).collect()
    assert len(rows) == 25  # 5 priorities x 5 segments all populated
    mi = rows[0]["mi_nats"]
    nmi = rows[0]["nmi"]
    assert all(r["mi_nats"] == mi and r["nmi"] == nmi for r in rows)
    assert mi >= -1e-9  # MI is nonnegative
    assert -1e-9 <= nmi <= 1.0
    # independence-ish synthetic data: dependence should be tiny
    assert nmi < 0.05
    n = sum(r["nij"] for r in rows)
    assert n > 0


def test_tukey_panel_shape(spark):
    rows = registry.QUERIES["stat_tukey_hsd"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) ordered pairs
    dfw = rows[0]["df_within"]
    assert all(r["df_within"] == dfw for r in rows) and dfw > 0
    for r in rows:
        assert r["g1"] < r["g2"]
        assert r["se"] > 0
        assert r["q_stat"] >= 0
        # q_stat must reconcile with mean_diff / se on the output grid
        assert abs(r["q_stat"] - abs(r["mean_diff"]) / r["se"]) < 0.05
