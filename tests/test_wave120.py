"""Wave 120 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_gbm_rmse_decreases(spark):
    rows = sorted(
        registry.QUERIES["ml_gbm_stumps"](spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    rmses = [r["train_rmse"] for r in rows]
    for a, b in zip(rmses, rmses[1:]):
        assert b <= a + 1e-9  # boosting reduces training error
    assert all(r["gain"] >= 0 for r in rows)
    assert all(1 <= r["split_at"] <= 6 for r in rows)


def test_try_math_counts(spark):
    r = registry.QUERIES["sql_try_math"](spark, SF).collect()[0]
    assert r["rows_in"] == 1500
    # exactly 1/5 of keys divide by zero
    assert abs(r["null_divides"] - 300) <= 5
    assert r["safe_sum"] > 0
    # every synthetic 'x<nnn>' string is unparseable
    assert r["bad_numbers"] == r["rows_in"]


def test_corpus_scorecard(spark):
    r = registry.QUERIES["ds_corpus_health_scorecard"](spark, SF).collect()[0]
    assert r["docs"] > 0 and r["tokens"] > 0
    assert 0.0 <= r["exact_dup_rate"] <= 1.0
    assert r["hygiene_defects"] == 0  # proven-clean corpus
    assert 0.0 <= r["blocklist_flag_rate"] <= 1.0
    # 20 equal sources → normalized entropy at the 1.0 ceiling
    assert r["source_mix_entropy"] > 0.95
