"""Wave 225 behavior gates beyond the registry oracle parity.

MMD must read identically-distributed groups as ~0 and separated
clusters as large; van der Waerden must fire on a planted location
shift (naming the groups) and stay quiet under exchangeability, and
the shared inverse-normal helper must agree with reference values.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def _write_emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def _hash_u(seed):
    return int(hashlib.md5(seed.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF


def test_mmd_separates_shifted_groups(spark, tmp_path):
    from mister_spark.operators.extras225 import stat_mmd_rbf

    # same distribution in both labels: MMD ~ 0
    rows = []
    for i in range(300):
        v = [2 * _hash_u(f"s:{i}:{j}") - 1 for j in range(64)]
        rows.append((i, [float(x) for x in v], i % 10))
    _write_emb(spark, tmp_path, rows)
    r0 = stat_mmd_rbf(spark, str(tmp_path)).collect()[0]
    assert abs(r0["mmd2"]) < 0.02, r0

    # group 1 shifted by +1.5 in every dim: MMD large
    rows = []
    for i in range(300):
        lab = i % 10
        off = 1.5 if lab < 5 else 0.0
        v = [2 * _hash_u(f"t:{i}:{j}") - 1 + off for j in range(64)]
        rows.append((i, [float(x) for x in v], lab))
    _write_emb(spark, tmp_path, rows)
    r1 = stat_mmd_rbf(spark, str(tmp_path)).collect()[0]
    assert r1["mmd2"] > 0.3, r1
    assert r1["mmd2"] > 10 * abs(r0["mmd2"]), (r0, r1)


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_vdw_fires_on_location_shift_only(spark, tmp_path):
    from mister_spark.operators.extras225 import stat_van_der_waerden

    # group 5 shifted high, group 1 low, others shared
    rows = []
    for g in range(1, 6):
        base = {1: 20000.0, 5: 80000.0}.get(g, 50000.0)
        for i in range(80):
            rows.append((f"{g}-P", base + 997.0 * (i % 13)))
    _write_orders(spark, tmp_path, rows)
    r = stat_van_der_waerden(spark, str(tmp_path)).collect()[0]
    assert r["n_orders"] == 400 and r["n_groups"] == 5, r
    assert r["p_value"] < 1e-4, r
    assert r["highest_group"] == "5" and r["lowest_group"] == "1", r

    # exchangeable: all groups share one value cycle
    rows = [
        (f"{g}-P", 50000.0 + 1009.0 * ((i + 7 * g) % 23))
        for g in range(1, 6)
        for i in range(80)
    ]
    _write_orders(spark, tmp_path, rows)
    r = stat_van_der_waerden(spark, str(tmp_path)).collect()[0]
    assert r["p_value"] > 0.01, r


def test_norm_ppf_matches_reference_values(spark):
    from mister_spark.functions.special import norm_ppf

    df = spark.createDataFrame(
        [(0.025,), (0.5,), (0.841344746,), (0.975,)], "p double"
    ).select(norm_ppf(F.col("p")).alias("z"))
    zs = [r["z"] for r in df.collect()]
    for got, want in zip(zs, (-1.959964, 0.0, 1.0, 1.959964)):
        assert abs(got - want) < 1e-5, (got, want)
