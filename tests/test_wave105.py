"""Wave 105 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_two_stage_rank(spark):
    r = registry.QUERIES["sim_two_stage_rank"](spark, SF).collect()[0]
    assert r["n_queries"] >= 10
    # stage-1 recall bounds the final hit rate (stage 2 only re-orders)
    assert r["final_hit_at_k"] <= r["stage1_recall"] + 1e-9
    assert r["stage1_recall"] >= 0.9
    assert r["final_hit_at_k"] >= 0.9


def test_session_cooccurrence_matrix(spark):
    rows = registry.QUERIES["ev_session_cooccurrence"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) unordered pairs
    for r in rows:
        assert r["ta"] < r["tb"]
        assert r["sessions_both"] >= 0
        assert r["lift"] >= 0


def test_encoding_audit_clean(spark):
    rows = registry.QUERIES["tx_encoding_audit"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        # the synthetic corpus is hygiene-clean; the audit must PROVE it
        assert r["ctrl_chars"] == 0
        assert r["carriage_returns"] == 0
        assert r["replacement_chars"] == 0
        assert r["edge_whitespace"] == 0
