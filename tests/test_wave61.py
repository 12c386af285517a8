"""Wave 61 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_job_chain_conserves_tokens(spark):
    rows = registry.QUERIES["mr_job_chain"](spark, SF).collect()
    assert rows
    total = sum(r["total"] for r in rows)
    n_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("size(filter(split(text, ' '), t -> t != '')) AS n")
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    assert total == n_tokens
    for r in rows:
        assert r["max_count"] <= r["total"]
        assert r["n_terms"] >= 1


def test_regression_diagnostics_identities(spark):
    rows = registry.QUERIES["stat_regression_diagnostics"](spark, SF).collect()
    n = len(rows)
    assert n > 50
    # leverages sum to the model dimension (2) and live in [1/n, 1]
    hsum = sum(r["leverage"] for r in rows)
    assert abs(hsum - 2.0) < 0.05
    for r in rows:
        assert 1.0 / n - 1e-3 <= r["leverage"] <= 1.0
        assert r["cooks_d"] >= 0


def test_sprt_decision_consistency(spark):
    rows = sorted(
        registry.QUERIES["ml_sprt_sequential"](spark, SF).collect(),
        key=lambda r: r["t"],
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b["n_cum"] >= a["n_cum"]
        assert b["k_cum"] >= a["k_cum"]
    import math

    for r in rows:
        if r["decision"] == "accept_h1":
            assert r["llr"] >= math.log(19) - 1e-6
        elif r["decision"] == "accept_h0":
            assert r["llr"] <= math.log(1 / 19) + 1e-6


def test_macro_auc_bounds(spark):
    rows = registry.QUERIES["ml_macro_auc"](spark, SF).collect()
    assert len(rows) == 10
    macro = {r["macro_auc"] for r in rows}
    assert len(macro) == 1
    aucs = [r["auc"] for r in rows]
    assert all(0.0 <= a <= 1.0 for a in aucs)
    m = macro.pop()
    assert abs(m - sum(aucs) / len(aucs)) < 0.001
