"""Wave 223 behavior gates beyond the registry oracle parity.

Matryoshka must read front-loaded embeddings as truncation-safe and
tail-loaded embeddings as truncation-hostile; Spiegelhalter must
accept a perfectly-calibrated scorer and reject a systematically
overconfident one.
"""

from __future__ import annotations

import hashlib
import math
import os


def _write_emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def _hash_u(seed, lo=-1.0, hi=1.0):
    h = int(hashlib.md5(seed.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    return lo + (hi - lo) * h


def test_matryoshka_reads_information_placement(spark, tmp_path):
    from mister_spark.operators.extras223 import emb_matryoshka_eval

    # front-loaded: dims 1..8 carry identity, the rest near-zero
    rows = []
    for i in range(80):
        v = [_hash_u(f"f:{i}:{j}") for j in range(8)] + [
            0.001 * ((i + j) % 3) for j in range(56)
        ]
        rows.append((i, [float(x) for x in v], 0))
    _write_emb(spark, tmp_path, rows)
    out = {r["dim"]: r for r in emb_matryoshka_eval(spark, str(tmp_path)).collect()}
    assert out[8]["overlap_at_10"] >= 0.9, out[8]
    assert out[64]["overlap_at_10"] == 1.0, out[64]
    assert out[8]["mean_sim_delta"] < 0.05, out[8]

    # tail-loaded: dims 1..8 are IDENTICAL for everyone, identity
    # lives in dims 9..64 -> 8-dim truncation is retrieval-blind
    rows = []
    for i in range(80):
        v = [0.5] * 8 + [_hash_u(f"t:{i}:{j}") for j in range(56)]
        rows.append((i, [float(x) for x in v], 0))
    _write_emb(spark, tmp_path, rows)
    out = {r["dim"]: r for r in emb_matryoshka_eval(spark, str(tmp_path)).collect()}
    assert out[64]["overlap_at_10"] == 1.0, out[64]
    assert out[8]["overlap_at_10"] < 0.5, out[8]
    assert out[8]["mean_sim_delta"] > out[32]["mean_sim_delta"], out


def test_spiegelhalter_separates_calibrated_from_overconfident(
    spark, tmp_path
):
    from mister_spark.operators.extras223 import stat_spiegelhalter_z

    # calibrated: p deterministic in [0.1, 0.9]; y = 1 exactly when a
    # uniform hash falls under p (label < 5 encodes y=1)
    rows = []
    for i in range(4000):
        p = 0.1 + 0.8 * ((i % 41) / 40)
        u = _hash_u(f"cal:{i}", 0.0, 1.0)
        y = u < p
        x = -math.log(1 / p - 1)  # sigmoid^-1: embedding dim 0
        rows.append((i, [float(x)] + [0.0] * 7, 0 if y else 9))
    _write_emb(spark, tmp_path, rows)
    r = stat_spiegelhalter_z(spark, str(tmp_path)).collect()[0]
    assert r["n_scored"] == 4000, r
    assert abs(r["z"]) < 2.5, r
    assert r["p_value"] > 0.01, r

    # overconfident: scores say 0.9/0.1 but truth is 0.6/0.4
    rows = []
    for i in range(4000):
        hi = i % 2 == 0
        p = 0.9 if hi else 0.1
        truth = 0.6 if hi else 0.4
        y = _hash_u(f"oc:{i}", 0.0, 1.0) < truth
        x = -math.log(1 / p - 1)
        rows.append((i, [float(x)] + [0.0] * 7, 0 if y else 9))
    _write_emb(spark, tmp_path, rows)
    r = stat_spiegelhalter_z(spark, str(tmp_path)).collect()[0]
    assert abs(r["z"]) > 10, r
    assert r["p_value"] < 1e-6, r
