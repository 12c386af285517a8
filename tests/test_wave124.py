"""Wave 124 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_frequent_directions_bound(spark):
    r = registry.QUERIES["sketch_frequent_directions"](spark, SF).collect()[0]
    assert r["n"] == 500 and r["sketch_rows"] == 16
    assert r["top_eig_exact"] > 0
    # FD shrinkage only UNDERestimates the spectrum, within the bound
    assert r["top_eig_sketch"] <= r["top_eig_exact"] + 1e-6
    assert r["abs_error"] <= r["fd_bound"] + 1e-6


def test_vocab_stability_bounds(spark):
    r = registry.QUERIES["tx_vocab_stability"](spark, SF).collect()[0]
    assert r["vocab"] == 31
    assert -1.0 <= r["rank_corr"] <= 1.0


def test_link_prediction_eval(spark):
    r = registry.QUERIES["graph_link_prediction_eval"](spark, SF).collect()[0]
    assert r["hidden_edges"] > 0
    assert 0 <= r["hits"] <= min(r["hidden_edges"], r["top_k"])
    assert 0.0 <= r["recall"] <= 1.0
    assert 0.0 <= r["precision"] <= 1.0
