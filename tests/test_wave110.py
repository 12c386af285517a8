"""Wave 110 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pandas_udaf_am_gm(spark):
    rows = registry.QUERIES["sql_pandas_udaf"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # AM-GM inequality must hold for every group
        assert r["geo_mean"] <= r["arith_mean"]
        assert r["n"] > 0


def test_mardia_matches_numpy(spark):
    r = registry.QUERIES["stat_mardia_kurtosis"](spark, SF).collect()[0]
    assert r["n"] == 500 and r["dim"] == 64
    assert r["expected"] == 64 * 66
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.array([list(e["embedding"]) for e in emb], dtype=np.float64)
    n, d = X.shape
    Xc = X - X.mean(0)
    S = (Xc.T @ Xc - 0) / (n - 1)
    Si = np.linalg.inv(S + 1e-9 * np.eye(d))
    m2 = np.einsum("ij,jk,ik->i", Xc, Si, Xc)
    b2 = float((m2**2).mean())
    assert abs(r["b2"] - round(b2, 4)) < 0.5


def test_input_file_audit(spark):
    rows = registry.QUERIES["io_input_file_audit"](spark, SF).collect()
    total_rows = sum(r["rows"] for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert total_rows == li
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r["file"].endswith(".parquet")
