"""Wave 230 behavior gates beyond the registry oracle parity.

LOO influence must attribute a planted single-nation trend to that
nation (others ~zero, downdate identity holds); the PU prior must
recover a planted class prior from a sliver of labeled positives.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F


def _write_panel(spark, tmp_path, cells):
    """cells: list of (nationkey, day_index, totalprice)."""
    cust, orders = [], []
    cust_of = {}
    oid = 0
    d0 = datetime.date(2024, 1, 1)
    nations = sorted({z for z, *_ in cells})
    for z, day, price in cells:
        if z not in cust_of:
            cust_of[z] = len(cust_of) + 1
            cust.append((cust_of[z], z))
        oid += 1
        orders.append(
            (
                oid, cust_of[z],
                (d0 + datetime.timedelta(days=day)).strftime("%Y-%m-%d"),
                price,
            )
        )
    base = str(tmp_path)
    spark.createDataFrame(cust, "c_custkey long, c_nationkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderdate_s string, "
        "o_totalprice double",
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))
    spark.createDataFrame(
        [(z, f"NATION_{z}") for z in nations], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(os.path.join(base, "nation.parquet"))


def test_loo_influence_names_the_trend_owner(spark, tmp_path):
    from mister_spark.operators.extras230 import stat_loo_influence

    # nation 7 trends +100/day; nations 1..4 are flat
    cells = []
    for day in range(30):
        cells.append((7, day, 1000.0 + 100.0 * day))
        for z in range(1, 5):
            cells.append((z, day, 2000.0))
    _write_panel(spark, tmp_path, cells)
    out = stat_loo_influence(spark, str(tmp_path)).collect()
    assert out[0]["nation"] == "NATION_7", out[0]
    assert abs(out[0]["slope_contribution"] - 100.0) < 0.1, out[0]
    assert abs(out[0]["slope_without"]) < 0.1, out[0]
    assert abs(out[0]["share_of_slope"] - 1.0) < 0.01, out[0]
    # flat nations contribute nothing
    for r in out[1:]:
        assert abs(r["slope_contribution"]) < 0.1, r
    # downdate identity: contribution + without = global slope
    s = out[0]["slope_contribution"] + out[0]["slope_without"]
    for r in out[1:]:
        assert abs(r["slope_contribution"] + r["slope_without"] - s) < 0.02


def _write_emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def test_pu_prior_recovers_planted_prior(spark, tmp_path):
    from mister_spark.operators.extras230 import ml_pu_prior_elkan

    def logit(p):
        return -math.log(1 / p - 1)

    # truth: 40% positives (score 0.9), 60% negatives (score 0.1);
    # only a 25% sliver of true positives is LABELED (SCAR)
    rows = []
    for i in range(4000):
        pos = (i % 5) < 2  # 40% positives
        labeled = pos and (i % 4 == 0)  # SCAR labeling of positives
        x = logit(0.9 if pos else 0.1)
        rows.append((i, [float(x)] + [0.0] * 7, 0 if labeled else 9))
    _write_emb(spark, tmp_path, rows)
    r = ml_pu_prior_elkan(spark, str(tmp_path)).collect()[0]
    assert r["n_total"] == 4000, r
    # labeled positives all score 0.9 -> c ~ 0.9
    assert abs(r["c_label_freq"] - 0.9) < 0.01, r
    # E[g] = .4*.9 + .6*.1 = 0.42 -> prior = 0.42/0.9 ~ 0.4667
    # (the perfect-scorer SCAR bias pulls above the true 0.4; the
    # estimate must land in that band, far from the labeled 10%)
    assert 0.4 < r["est_prior"] < 0.5, r
    assert r["est_hidden_positives"] > 1000, r
