"""Wave 123 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_covariate_shift_near_null(spark):
    rows = registry.QUERIES["ml_covariate_shift_weights"](spark, SF).collect()
    assert len(rows) == 10
    ess = {r["ess_fraction"] for r in rows}
    assert len(ess) == 1
    # uniform synthetic split at a 150-customer fixture: binomial bin
    # noise costs some ESS, but most of the sample must survive
    assert list(ess)[0] > 0.5
    for r in rows:
        assert 0.0 < r["weight"] < 5.0


def test_encoding_audit(spark):
    rows = registry.QUERIES["io_encoding_audit"](spark, SF).collect()
    cols = {r["column"] for r in rows}
    assert {"o_orderkey", "o_custkey", "o_totalprice"} <= cols
    for r in rows:
        assert r["compressed_bytes"] > 0
        assert r["uncompressed_bytes"] >= r["compressed_bytes"] * 0.5
        assert r["ratio"] > 0


def test_mantel_haenszel_null(spark):
    r = registry.QUERIES["stat_mantel_haenszel"](spark, SF).collect()[0]
    assert r["strata"] == 7
    assert r["mh_numerator"] > 0 and r["mh_denominator"] > 0
    # priority independent of status → OR near 1
    assert 0.5 < r["mh_odds_ratio"] < 2.0
