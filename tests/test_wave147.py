"""Wave 147 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_first_session_retention(spark):
    rows = registry.QUERIES["ev_first_session_retention"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["users"] > 0
        assert 0.0 <= r["any_return_rate"] <= 1.0
        assert r["avg_later_active_days"] >= 0


def test_coding_efficiency(spark):
    r = registry.QUERIES["tx_coding_efficiency"](spark, SF).collect()[0]
    assert r["vocab"] == 31
    # entropy is bounded by fixed-length coding of the vocab
    assert r["entropy_bits_per_token"] <= r["fixed_bits_per_token"] + 1e-6
    # tokens cost more raw UTF-8 bits than their entropy
    assert r["utf8_bits_per_token"] > r["entropy_bits_per_token"]
    assert 0.0 < r["compression_floor"] < 1.0
