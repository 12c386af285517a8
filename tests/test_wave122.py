"""Wave 122 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_wilcoxon_consistent_with_sign(spark):
    w = registry.QUERIES["stat_wilcoxon_signed_rank"](spark, SF).collect()[0]
    s = registry.QUERIES["stat_sign_test"](spark, SF).collect()[0]
    assert w["n"] == s["nonzero_pairs"]
    assert 0 <= w["w_plus"] <= w["n"] * (w["n"] + 1) / 2
    # the two paired tests read the same differences: same sign
    if abs(w["z"]) > 0.5 and abs(s["z"]) > 0.5:
        assert (w["z"] > 0) == (s["z"] > 0)


def test_identifier_clause(spark):
    rows = {r["grouped_by"]: r for r in
            registry.QUERIES["sql_identifier_clause"](spark, SF).collect()}
    assert set(rows) == {"o_orderpriority", "o_orderstatus"}
    assert rows["o_orderpriority"]["groups"] == 5
    assert rows["o_orderstatus"]["groups"] >= 2
    assert all(r["rows_in"] == 1500 for r in rows.values())


def test_ngram_coverage_monotone(spark):
    rows = sorted(
        registry.QUERIES["tx_ngram_coverage"](spark, SF).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [10, 100, 500]
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)  # more top-k, more coverage
    assert 0.0 < covs[0] <= covs[-1] <= 1.0
    assert rows[0]["bigram_vocab"] > 100
