"""Wave 71 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras71 import CANARIES, EIG_ITERS

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_eigencentrality_matches_numpy(spark):
    from mister_spark.operators.extras47 import _copurchase_edges

    rows = registry.QUERIES["graph_eigencentrality"](spark, SF).collect()
    assert rows
    e0 = _copurchase_edges(spark, SF).select("p1", "p2").collect()
    nodes = sorted({r["p1"] for r in e0} | {r["p2"] for r in e0})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for r in e0:
        A[idx[r["p1"]], idx[r["p2"]]] = 1.0
        A[idx[r["p2"]], idx[r["p1"]]] = 1.0
    x = np.ones(len(nodes))
    for _ in range(EIG_ITERS):
        x = A @ x
        x = x / np.linalg.norm(x)
    for r in rows:
        assert abs(r["centrality"] - x[idx[r["node"]]]) < 1e-4


def test_two_way_anova_structure(spark):
    rows = {r["effect"]: r for r in
            registry.QUERIES["stat_two_way_anova"](spark, SF).collect()}
    assert set(rows) == {"event_type", "weekday", "interaction"}
    assert rows["event_type"]["df1"] == 4
    assert rows["weekday"]["df1"] == 6
    assert rows["interaction"]["df1"] == 24
    for r in rows.values():
        assert r["f_stat"] >= 0
        assert 0.0 <= r["p_approx"] <= 1.0


def test_canary_zeros_are_provable(spark):
    rows = {r["canary"]: r for r in
            registry.QUERIES["tx_canary_detect"](spark, SF).collect()}
    assert set(rows) == set(CANARIES)
    assert rows["scan"]["n_docs"] > 0  # the real token
    for planted in CANARIES[1:]:
        assert rows[planted]["n_docs"] == 0
        assert rows[planted]["n_occurrences"] == 0


def test_semantic_outliers_are_sourcewise_minima(spark):
    rows = registry.QUERIES["tx_semantic_outliers"](spark, SF).collect()
    assert len(rows) == 40  # 2 per source
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, lst in by_src.items():
        assert len(lst) == 2
        lst.sort(key=lambda r: r["rn"])
        assert lst[0]["cos"] <= lst[1]["cos"] + 1e-9
        for r in lst:
            assert -1.0 <= r["cos"] <= 1.0
