"""Wave 84 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras84 import (
    GMM_K,
    MAHA_RIDGE,
    gmm_train,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_friedman_shape(spark):
    r = registry.QUERIES["stat_friedman"](spark, SF).collect()[0]
    assert r["blocks"] == 7
    assert r["treatments"] >= 2
    assert r["dof"] == r["treatments"] - 1
    assert r["q"] >= 0.0


def test_huber_downweights(spark):
    r = registry.QUERIES["stat_huber_regression"](spark, SF).collect()[0]
    # the synthetic lineitem has no quantity→price relation
    # (corr ≈ −0.01), so the robust slope must stay near zero relative
    # to the ~52k mean price, and the intercept must carry the level
    assert abs(r["slope"]) < 1000
    assert 40000 < r["intercept"] < 70000
    # Huber must actually downweight something on a heavy-ish tail,
    # but never upweight (w <= 1 by construction)
    assert 0.5 < r["mean_weight"] <= 1.0


def test_mahalanobis_matches_numpy(spark):
    got = {
        r["vec_id"]: r["d2"]
        for r in registry.QUERIES["ml_mahalanobis_outliers"](spark, SF).collect()
    }
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    vi = np.linalg.inv(cov + MAHA_RIDGE * np.eye(X.shape[1]))
    C = X - mu
    d2 = np.floor(np.einsum("ij,jk,ik->i", C, vi, C) * 1e4 + 0.5) / 1e4
    top = sorted(zip(d2, ids), key=lambda t: (-t[0], t[1]))[:20]
    want = {int(i): float(d) for d, i in top}
    assert got == want
    # squared Mahalanobis of d-dim Gaussianish data ~ chi2(d): top-20
    # must all exceed the dimension (the mean of the distribution)
    assert min(got.values()) > X.shape[1]


def test_gmm_em_monotone_loglik(spark):
    pis, mus, sigmas, lls = gmm_train(spark, SF)
    assert len(pis) == GMM_K
    assert abs(sum(pis) - 1.0) < 1e-9
    assert all(s > 0 for s in sigmas)
    # EM guarantees non-decreasing likelihood
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9
    rows = registry.QUERIES["ml_gmm_em"](spark, SF).collect()
    assert [r["component"] for r in rows] == list(range(GMM_K))
    mus_out = [r["mu"] for r in rows]
    assert mus_out == sorted(mus_out)
