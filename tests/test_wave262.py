"""Wave 262 behavior gates beyond the registry oracle parity.

Cox calibration must recover (0, 1) on a perfectly calibrated
synthetic score and flag the shared triad score's miscalibration
consistently with temperature scaling's verdict.
"""

from __future__ import annotations

import math
import os

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cox_recovers_identity_on_calibrated_score(spark, tmp_path):
    """Labels drawn deterministically so that the empirical rate at
    each logit EQUALS sigma(logit): a near-(0,1) fit must come back."""
    import itertools

    from mister_spark.operators.extras262 import ml_cox_calibration

    rows = []
    vid = 0
    # grid of logits; at each, labels split to match sigma(z) exactly
    for z in [-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0]:
        p = 1.0 / (1.0 + math.exp(-z))
        n = 200
        ones = round(p * n)
        for i in range(n):
            y = 1 if i < ones else 0
            # label bit 1 carries y; embedding dim 1 = z - 1.5*(2y-1)
            # so the op's reconstructed logit is exactly z
            emb = [z - 1.5 * (2 * y - 1)] + [0.0] * 63
            rows.append((vid, emb, 2 * y))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    r = ml_cox_calibration(spark, str(tmp_path)).collect()[0]
    assert abs(r["intercept"]) < 0.1, r
    assert abs(r["slope"] - 1.0) < 0.1, r
    assert r["verdict"] == "calibrated_slope"


def test_cox_agrees_with_temperature_direction(spark):
    cox = registry.QUERIES["ml_cox_calibration"](spark, SF).collect()[0]
    ts = registry.QUERIES["ml_temperature_scaling"](spark, SF).collect()[0]
    # slope > 1 (underconfident) must pair with T < 1 (sharpen);
    # slope < 1 with T > 1
    if cox["slope"] > 1.1:
        assert ts["temperature"] < 1.0, (cox["slope"], ts["temperature"])
    elif cox["slope"] < 0.9:
        assert ts["temperature"] > 1.0
