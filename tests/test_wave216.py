"""Wave 216 behavior gates beyond the registry oracle parity.

Brunner-Munzel must stay quiet when groups share a center but differ
in spread, and fire with p_hat > 1/2 on a planted stochastic shift;
the validity indices must prefer separated blobs over overlapping
ones and name the planted closest pair.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderpriority string, o_totalprice double, o_orderdate_s string",
    ).select(
        "o_orderpriority", "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_brunner_munzel_separates_shift_from_spread(spark, tmp_path):
    from mister_spark.operators.extras216 import stat_brunner_munzel

    day = "2024-01-05"
    # same center 50000, very different spreads: no superiority
    rows = []
    for i in range(200):
        rows.append(("1-U", 50000.0 + 600.0 * ((i % 5) - 2), day))
        rows.append(("5-L", 50000.0 + 9000.0 * ((i % 9) - 4), day))
    _write_orders(spark, tmp_path, rows)
    r = stat_brunner_munzel(spark, str(tmp_path)).collect()[0]
    assert r["n_a"] == 200 and r["n_b"] == 200, r
    assert abs(r["p_hat"] - 0.5) < 0.05, r
    assert r["p_value"] > 0.1, r

    # B stochastically larger: every B value above every A value
    rows = []
    for i in range(200):
        rows.append(("1-U", 30000.0 + 600.0 * (i % 5), day))
        rows.append(("5-L", 90000.0 + 9000.0 * (i % 9), day))
    _write_orders(spark, tmp_path, rows)
    r = stat_brunner_munzel(spark, str(tmp_path)).collect()[0]
    assert r["p_hat"] == 1.0, r
    assert r["p_value"] < 1e-4, r


def test_validity_indices_prefer_separated_blobs(spark, tmp_path):
    from mister_spark.operators.extras216 import ml_cluster_validity

    d0 = datetime.date(2024, 1, 1)

    def blob(prio, price0, day0, n=80, spread=300.0):
        out = []
        for i in range(n):
            d = (d0 + datetime.timedelta(days=day0 + i % 5)).strftime(
                "%Y-%m-%d"
            )
            out.append((prio, price0 + spread * ((i % 7) - 3), d))
        return out

    # three well-separated blobs; clusters 2 and 3 planted closest
    rows = (
        blob("1-U", 20000.0, 0)
        + blob("2-H", 90000.0, 300)
        + blob("3-M", 101000.0, 330)
    )
    _write_orders(spark, tmp_path, rows)
    r = ml_cluster_validity(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 3 and r["n_points"] == 240, r
    ch_sep, db_sep = r["calinski_harabasz"], r["davies_bouldin"]
    assert {r["worst_pair_a"], r["worst_pair_b"]} == {2, 3}, r

    # heavily overlapping blobs: CH collapses, DB blows up
    rows = (
        blob("1-U", 50000.0, 100, spread=8000.0)
        + blob("2-H", 52000.0, 102, spread=8000.0)
        + blob("3-M", 54000.0, 104, spread=8000.0)
    )
    _write_orders(spark, tmp_path, rows)
    r = ml_cluster_validity(spark, str(tmp_path)).collect()[0]
    assert r["calinski_harabasz"] < ch_sep / 5, (r, ch_sep)
    assert r["davies_bouldin"] > db_sep * 2, (r, db_sep)
