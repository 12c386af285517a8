"""Wave 100 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras100 import CAP_K

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_frequency_cap_accounting(spark):
    rows = registry.QUERIES["ev_frequency_cap"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["served"] + r["suppressed"] == r["total"]
        assert 0 <= r["suppression_rate"] <= 1
    # heavy users exist → the cap must actually bite somewhere
    assert any(r["suppressed"] > 0 for r in rows)


def test_power_iteration_svd(spark):
    rows = registry.QUERIES["ml_power_iteration_svd"](spark, SF).collect()
    assert len(rows) == 10
    assert rows[0]["vocab"] == 31
    loadings = [abs(r["loading"]) for r in rows]
    assert loadings == sorted(loadings, reverse=True)
    # the dominant tf-idf direction is non-trivial
    assert rows[0]["sigma"] > 0
    # unit-ish vector: top-10 mass can't exceed 1
    assert sum(x * x for x in loadings) <= 1.0 + 1e-6


def test_holdout_ppl_sane(spark):
    r = registry.QUERIES["tx_lm_holdout_ppl"](spark, SF).collect()[0]
    assert r["eval_tokens"] > 0
    # shared 31-type vocabulary: no true OOV expected, but the slot
    # must exist (count field present and small)
    assert 0 <= r["oov_tokens"] < r["eval_tokens"] * 0.05
    # perplexity of a 31-type corpus lies in (1, 31+1]
    assert 1.0 < r["ppl"] <= 32.0
    assert abs(r["ppl"] - 2.718281828459045 ** r["nll"]) < 0.05
