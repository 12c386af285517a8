"""Wave 178 behavior gates."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_quality_classifier_beats_baseline(spark):
    r = registry.QUERIES["ds_quality_classifier"](spark, SF).collect()[0]
    # the learned gate must clearly beat predicting the majority class
    assert r["accuracy"] >= r["majority_baseline"] + 0.15, r
    assert r["precision"] > 0.6 and r["recall"] > 0.6
    assert 0 < r["f1"] <= 1
    # trained NLL well below the coin-flip 0.693
    assert r["train_nll"] < 0.5
    # quarter split
    assert r["heldout_docs"] * 3 <= r["train_docs"] + 3
