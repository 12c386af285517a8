"""Wave 189 behavior gates beyond the registry oracle parity.

Cucconi must fire on a planted location shift AND on a planted scale
difference (its whole point is covering both alternatives with one
statistic) and stay small under exchangeability; the LSH kNN eval must
score near-perfectly on well-separated planted clusters and report
leave-one-out coverage honestly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    (
        spark.createDataFrame(rows, "event_type string, value double")
        .withColumn("event_id", F.monotonically_increasing_id())
        .withColumn("user_id", F.lit(0).cast("long"))
        .withColumn("ts", F.lit("2024-01-01").cast("timestamp"))
        .withColumn("props", F.lit("{}"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_cucconi_fires_on_shift_and_on_spread(spark, tmp_path):
    from mister_spark.operators.extras189 import stat_cucconi

    # (a) pure location shift
    rows = [("click", 100.0 + v) for v in range(80)] + [
        ("view", 500.0 + v) for v in range(80)
    ]
    _write_events(spark, tmp_path, rows)
    c_shift = stat_cucconi(spark, str(tmp_path)).collect()[0]["c"]
    # (b) pure scale difference, same center
    rows = [("click", 500.0 + d) for d in range(-40, 40)] + [
        ("view", 500.0 + 10 * d) for d in range(-40, 40)
    ]
    _write_events(spark, tmp_path, rows)
    c_scale = stat_cucconi(spark, str(tmp_path)).collect()[0]["c"]
    # (c) identical distributions interleaved
    rows = [("click", float(v)) for v in range(80)] + [
        ("view", float(v) + 0.5) for v in range(80)
    ]
    _write_events(spark, tmp_path, rows)
    c_null = stat_cucconi(spark, str(tmp_path)).collect()[0]["c"]
    # Under H0, C is ~Exp(1)-ish: planted alternatives must dwarf it
    assert c_shift > 10, c_shift
    assert c_scale > 10, c_scale
    assert c_null < 3, c_null
    assert min(c_shift, c_scale) > 5 * c_null


def test_knn_lsh_eval_on_separated_clusters(spark, tmp_path):
    """Two well-separated embedding clusters: every vector's 5 LSH
    neighbors share its cluster, so leave-one-out accuracy is ~1."""
    import numpy as np

    from mister_spark.operators.extras189 import ml_knn_lsh_eval

    rng = np.random.default_rng(189)
    rows = []
    for i in range(120):
        label = i % 2
        center = np.zeros(64)
        center[:32] = 10.0 if label == 0 else -10.0
        center[32:] = -10.0 if label == 0 else 10.0
        v = center + rng.normal(0, 0.05, 64)
        rows.append((i, [float(x) for x in v], label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    r = ml_knn_lsh_eval(spark, str(tmp_path)).collect()[0]
    assert r["vectors"] == 120
    # opposite-sign blocks collide in no LSH table; same-cluster
    # near-identical vectors collide in essentially all
    assert r["voted"] >= 110, r
    assert r["accuracy"] >= 0.99, r
    assert r["correct"] <= r["voted"]
