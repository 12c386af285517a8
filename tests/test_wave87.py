"""Wave 87 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_hill_alpha_positive(spark):
    r = registry.QUERIES["stat_pareto_hill"](spark, SF).collect()[0]
    assert r["k"] == 100
    assert r["xmin"] > 0
    # uniform-ish bounded prices → steep tail (alpha far above 2);
    # a true power law would sit below ~3
    assert r["hill_alpha"] > 0


def test_brier_decomposition_identity(spark):
    r = registry.QUERIES["ml_brier_decomposition"](spark, SF).collect()[0]
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0.0
    assert r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25
    # Murphy identity holds up to within-bin variance + rounding
    residual = r["brier"] - (
        r["reliability"] - r["resolution"] + r["uncertainty"]
    )
    assert abs(residual) < 0.02, residual


def test_delong_ci_covers_auc(spark):
    r = registry.QUERIES["ml_auc_delong_ci"](spark, SF).collect()[0]
    assert r["n_pos"] + r["n_neg"] == 500
    assert 0.0 <= r["auc"] <= 1.0
    assert r["se"] > 0
    assert r["ci_lo"] < r["auc"] < r["ci_hi"]
    # label%2 vs one embedding dim: essentially random → CI near 0.5
    assert r["ci_lo"] < 0.57 and r["ci_hi"] > 0.43


def test_ppr_mass_and_seed(spark):
    rows = registry.QUERIES["graph_ppr"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["ppr"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)
    # total PPR mass over ALL nodes is 1; the top-20 carries most of it
    assert sum(scores) <= 1.0 + 1e-6
    # the seed receives the restart mass every step, so the top score
    # must be at least alpha = 0.15
    assert scores[0] >= 0.15
