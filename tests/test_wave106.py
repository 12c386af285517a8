"""Wave 106 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras106 import SPLINE_KNOTS

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_paired_ttest_shape(spark):
    r = registry.QUERIES["stat_paired_ttest"](spark, SF).collect()[0]
    assert r["pairs"] > 50
    assert r["t_stat"] == r["t_stat"]  # not NaN


def test_sign_test_consistency(spark):
    t = registry.QUERIES["stat_paired_ttest"](spark, SF).collect()[0]
    s = registry.QUERIES["stat_sign_test"](spark, SF).collect()[0]
    assert s["nonzero_pairs"] <= t["pairs"]
    assert 0 <= s["increased"] <= s["nonzero_pairs"]
    assert 0.0 <= s["p_two_sided"] <= 1.0
    # both tests read the same differences: their z/t must agree in sign
    if abs(s["z"]) > 0.5 and abs(t["t_stat"]) > 0.5:
        assert (s["z"] > 0) == (t["t_stat"] > 0)


def test_spline_beats_line(spark):
    rows = registry.QUERIES["ml_spline_regression"](spark, SF).collect()
    assert len(rows) == len(SPLINE_KNOTS) + 1
    r = rows[0]
    # adding hinge features can only reduce training SSE
    assert r["rmse_spline"] <= r["rmse_line"] + 1e-6
    # numpy replay of the closed-form solve
    d = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice"
    ).collect()
    x = np.array([row["l_quantity"] for row in d])
    y = np.array([row["l_extendedprice"] for row in d])
    X = np.column_stack(
        [np.ones_like(x), x] + [np.maximum(x - k, 0.0) for k in SPLINE_KNOTS]
    )
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    rmse = float(np.sqrt(np.mean((X @ beta - y) ** 2)))
    assert abs(r["rmse_spline"] - round(rmse, 4)) < max(0.01 * rmse, 0.5)
