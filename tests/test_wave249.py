"""Wave 249 behavior gates beyond the registry oracle parity.

Lilliefors must accept a textbook-normal sample (exact normal
quantiles) and reject a uniform one, and its D must fall as the normal
sample grows.
"""

from __future__ import annotations

import os
from statistics import NormalDist


def _write_customers(spark, tmp_path, balances):
    spark.createDataFrame(
        [(i + 1, round(b, 2)) for i, b in enumerate(balances)],
        "c_custkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "customer.parquet")
    )


def _normal_sample(n, mu=5000.0, sd=800.0):
    nd = NormalDist(mu, sd)
    return [nd.inv_cdf((i + 0.5) / n) for i in range(n)]


def test_lilliefors_accepts_normal_rejects_uniform(spark, tmp_path):
    from mister_spark.operators.extras249 import stat_lilliefors

    _write_customers(spark, tmp_path, _normal_sample(400))
    ok = stat_lilliefors(spark, str(tmp_path)).collect()[0]
    assert ok["reject_normal"] == 0, ok
    assert ok["p_value"] > 0.2, ok
    assert abs(ok["mean"] - 5000.0) < 10

    uniform = [1000.0 + i * 10.0 for i in range(400)]
    _write_customers(spark, tmp_path, uniform)
    bad = stat_lilliefors(spark, str(tmp_path)).collect()[0]
    assert bad["reject_normal"] == 1, bad
    assert bad["p_value"] < 0.01, bad
    assert bad["d_stat"] > ok["d_stat"]


def test_lilliefors_d_shrinks_with_n(spark, tmp_path):
    from mister_spark.operators.extras249 import stat_lilliefors

    ds = []
    for n in (100, 1000):
        _write_customers(spark, tmp_path, _normal_sample(n))
        ds.append(stat_lilliefors(spark, str(tmp_path)).collect()[0]["d_stat"])
    assert ds[1] < ds[0], ds
