"""Wave 119 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_functional_cycles_partition(spark):
    r = registry.QUERIES["graph_functional_cycles"](spark, SF).collect()[0]
    assert r["cycle_nodes"] + r["tail_nodes"] == r["nodes"]
    # a functional graph always has at least one cycle, and every
    # 2-cycle contributes two cycle nodes
    assert r["cycle_nodes"] >= 2
    assert 2 * r["mutual_pairs"] <= r["cycle_nodes"]


def test_intra_doc_drift(spark):
    rows = registry.QUERIES["tx_intra_doc_drift"](spark, SF).collect()
    assert len(rows) == 10
    vals = [r["jsd"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # JS divergence with ln base is bounded by ln 2
    assert all(0.0 <= v <= 0.6932 for v in vals)


def test_rolling_origin_cv(spark):
    rows = registry.QUERIES["ev_rolling_origin_cv"](spark, SF).collect()
    folds = [r for r in rows if r["fold"] > 0]
    summary = [r for r in rows if r["fold"] == 0]
    assert len(folds) == 3 and len(summary) == 1
    pooled = summary[0]["mae"]
    maes = [r["mae"] for r in folds]
    assert min(maes) - 1e-9 <= pooled <= max(maes) + 1e-9
    assert summary[0]["mae_spread"] >= 0
