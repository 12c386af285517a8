"""Wave 99 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras99 import PH_LAMBDA, T2_RIDGE

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_variant_extraction(spark):
    rows = registry.QUERIES["sql_variant_json"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n"] > 0
        assert 0 <= r["k_avg"] <= r["k_max"]
        assert r["k_sum"] >= r["k_max"]


def test_hotelling_t2_aa(spark):
    r = registry.QUERIES["stat_hotelling_t2"](spark, SF).collect()[0]
    assert r["n_even"] + r["n_odd"] == 500
    assert r["dim"] == 64
    assert r["t2"] >= 0
    # label-parity is an A/A-ish split: F must stay well under the
    # ~1.4 rejection region for F(64, 435)
    assert r["f_stat"] < 1.6


def test_hotelling_matches_numpy(spark):
    r = registry.QUERIES["stat_hotelling_t2"](spark, SF).collect()[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.array([list(e["embedding"]) for e in emb], dtype=np.float64)
    y = np.array([e["label"] % 2 for e in emb])
    A, B = X[y == 0], X[y == 1]
    n1, n2, d = len(A), len(B), X.shape[1]
    sc1 = (A - A.mean(0)).T @ (A - A.mean(0))
    sc2 = (B - B.mean(0)).T @ (B - B.mean(0))
    sp = (sc1 + sc2) / (n1 + n2 - 2) + T2_RIDGE * np.eye(d)
    diff = A.mean(0) - B.mean(0)
    t2 = (n1 * n2) / (n1 + n2) * diff @ np.linalg.solve(sp, diff)
    assert abs(r["t2"] - round(float(t2), 4)) < 1e-3


def test_page_hinkley_state(spark):
    r = registry.QUERIES["ev_page_hinkley"](spark, SF).collect()[0]
    assert r["n_days"] >= 25
    assert r["alarmed"] in (0, 1)
    if r["alarmed"]:
        assert r["ph_at_alarm"] > PH_LAMBDA
        assert r["alarm_day"] > 0
    assert r["final_ph"] >= 0
