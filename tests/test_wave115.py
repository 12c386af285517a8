"""Wave 115 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras115 import MRMR_K

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_collations_fold_case(spark):
    rows = registry.QUERIES["sql_collations"](spark, SF).collect()
    # 5 priorities, 3 casings each → exactly 5 collated groups
    assert len(rows) == 5
    assert all(r["pri_ci"] == r["pri_ci"].lower() for r in rows)
    total = sum(r["n"] for r in rows)
    assert total == spark.read.parquet(f"{SF}/orders.parquet").count()


def test_mrmr_selection(spark):
    rows = sorted(
        registry.QUERIES["ml_mrmr_selection"](spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, MRMR_K + 1))
    dims = [r["dim"] for r in rows]
    assert len(set(dims)) == MRMR_K  # no repeats
    # first pick maximizes pure relevance
    assert rows[0]["mrmr_score"] == rows[0]["relevance"]
    for r in rows:
        assert r["mrmr_score"] <= r["relevance"] + 1e-9


def test_greedy_matching_valid(spark):
    r = registry.QUERIES["graph_greedy_matching"](spark, SF).collect()[0]
    assert r["matched_pairs"] >= 1
    # a matching covers at most all nodes, two per pair
    assert 2 * r["matched_pairs"] <= r["nodes"]
    assert 0.0 < r["matched_node_share"] <= 1.0
    # maximal matching on a connected-ish graph covers a solid share
    assert r["matched_node_share"] >= 0.3
