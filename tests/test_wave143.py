"""Wave 143 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_regexp_suite(spark):
    r = registry.QUERIES["sql_regexp_suite"](spark, SF).collect()[0]
    assert r["docs"] > 0
    assert r["the_matches"] > 0  # 'the' is in the synthetic vocab
    assert 0 <= r["starts_with_the"] <= r["docs"]
    assert r["devoweled_chars"] > 0
    assert r["word_matches"] > 0


def test_cache_storage_audit(spark):
    r = registry.QUERIES["io_cache_storage_audit"](spark, SF).collect()[0]
    assert r["rows"] == 6000
    assert r["cached_frames"] >= 1
    assert r["cached_blocks"] >= 1
    assert r["memory_bytes"] > 0
    # the projection fits in memory: fully resident
    assert r["max_resident_fraction"] == 1.0
