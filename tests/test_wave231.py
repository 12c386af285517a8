"""Wave 231 behavior gates beyond the registry oracle parity.

Friedman's H must read an additive surface as ~0 and a pure
interaction as large; revenue betas must recover planted
amplifier/defensive/idiosyncratic units.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderdate_s string, o_orderpriority string, o_totalprice double",
    ).select(
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority", "o_totalprice",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_friedman_h_separates_additive_from_interaction(spark, tmp_path):
    from mister_spark.operators.extras231 import ml_friedman_h

    d0 = datetime.date(2024, 1, 1)

    def day_for(w):
        # find a date with weekday code w (1..7 in the op's encoding)
        for off in range(7):
            d = d0 + datetime.timedelta(days=off)
            if ((d.weekday()) % 7) + 1 == w:
                return d.strftime("%Y-%m-%d")
        raise AssertionError

    # additive: y = a(weekday<=3) + b(priority<=2): a depth-2 tree
    # splitting f-then-other fits it EXACTLY only if one split per
    # path suffices; use one binary feature each so the tree captures
    # the full additive surface -> H ~ small
    rows = []
    for i in range(400):
        w = (i % 6) + 1
        g = (i % 5) + 1
        y = (10000.0 if w <= 3 else 0.0) + (40000.0 if g <= 2 else 0.0)
        rows.append((day_for(w), f"{g}-P", y + 20000.0))
    _write_orders(spark, tmp_path, rows)
    r_add = ml_friedman_h(spark, str(tmp_path)).collect()[0]

    # pure interaction: y large ONLY when (late week AND low priority)
    rows = []
    for i in range(400):
        w = (i % 6) + 1
        g = (i % 5) + 1
        y = 60000.0 if (w >= 4 and g >= 4) else 20000.0
        rows.append((day_for(w), f"{g}-P", y))
    _write_orders(spark, tmp_path, rows)
    r_int = ml_friedman_h(spark, str(tmp_path)).collect()[0]
    assert r_int["h_squared"] > r_add["h_squared"] + 0.1, (r_add, r_int)
    assert r_int["h_squared"] > 0.2, r_int


def _write_panel(spark, tmp_path, cells):
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


def test_revenue_beta_recovers_planted_structure(spark, tmp_path):
    from mister_spark.operators.extras231 import fin_revenue_beta

    # market wave: base 1000 +/- cycle; nation 1 = 2x the wave,
    # nation 2 = 1x, nation 3 = constant (idiosyncratic zero-beta)
    wave = [200.0 * ((i % 7) - 3) for i in range(28)]
    cells = []
    for day, w in enumerate(wave):
        cells.append((1, day, 2000.0 + 2 * w))
        cells.append((2, day, 2000.0 + w))
        cells.append((3, day, 1500.0))
    _write_panel(spark, tmp_path, cells)
    out = {r["nation"]: r for r in fin_revenue_beta(spark, str(tmp_path)).collect()}
    # market = sum of the three = 5500 + 3w -> nation1 beta = 2/3
    assert abs(out["NATION_1"]["beta"] - 2 / 3) < 0.01, out["NATION_1"]
    assert abs(out["NATION_2"]["beta"] - 1 / 3) < 0.01, out["NATION_2"]
    assert abs(out["NATION_3"]["beta"]) < 0.01, out["NATION_3"]
    assert out["NATION_3"]["r2"] < 0.05, out["NATION_3"]
    assert out["NATION_1"]["r2"] > 0.95, out["NATION_1"]
