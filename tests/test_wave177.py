"""Wave 177 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_wilks_manova_matches_numpy(spark):
    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras177 import MANOVA_K

    emb = Catalog(spark, SF)["embeddings"].select("embedding", "label").collect()
    X = np.array(
        [[float(r["embedding"][0]), float(r["embedding"][1])] for r in emb]
    )
    g = np.array([r["label"] % MANOVA_K for r in emb])
    W = np.zeros((2, 2))
    for gi in range(MANOVA_K):
        Xi = X[g == gi]
        D = Xi - Xi.mean(axis=0)
        W += D.T @ D
    D = X - X.mean(axis=0)
    T = D.T @ D
    lam = np.linalg.det(W) / np.linalg.det(T)
    r = registry.QUERIES["stat_wilks_manova"](spark, SF).collect()[0]
    assert abs(r["wilks_lambda"] - lam) < 0.001
    n, k = len(X), MANOVA_K
    f = (1 - np.sqrt(lam)) / np.sqrt(lam) * (n - k - 1) / (k - 1)
    assert abs(r["f_stat"] - f) < 0.01
    assert (r["df1"], r["df2"]) == (2 * (k - 1), 2 * (n - k - 1))
    assert 0 < r["wilks_lambda"] <= 1


def test_nrr_ledger_identities(spark):
    rows = registry.QUERIES["ev_nrr"](spark, SF).collect()
    assert len(rows) >= 5
    for r in rows:
        # base = retained + contraction + churned (to the cent)
        assert (
            abs(
                r["base_rev"]
                - (r["retained_rev"] + r["contraction"] + r["churned_rev"])
            )
            < 0.05
        ), r
        # nrr = (retained + expansion) / base
        assert (
            abs(r["nrr"] - (r["retained_rev"] + r["expansion"]) / r["base_rev"])
            < 0.001
        ), r
        assert r["base_customers"] > 0
