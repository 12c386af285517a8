"""Wave 153 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_forecastability(spark):
    rows = registry.QUERIES["ev_forecastability"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["forecastability"] <= 1.0
        assert r["dominant_period_days"] >= 2.0
    # flat synthetic traffic: no series should look highly rhythmic
    assert all(r["forecastability"] < 0.6 for r in rows)


def test_fair_thresholds(spark):
    rows = registry.QUERIES["ml_fair_thresholds"](spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        # each group's threshold achieves the TPR target (>= by design)
        assert r["achieved_tpr"] >= 0.8 - 1e-9
        assert 0.0 <= r["fpr"] <= 1.0
        assert r["positives"] > 0 and r["negatives"] > 0
    # the two solved TPRs are equalized within quantile granularity
    assert abs(rows[0]["achieved_tpr"] - rows[1]["achieved_tpr"]) < 0.05
