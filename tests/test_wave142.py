"""Wave 142 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_markov_eval(spark):
    r = registry.QUERIES["ev_markov_eval"](spark, SF).collect()[0]
    assert r["pairs"] > 0
    assert 0.0 <= r["markov_accuracy"] <= 1.0
    assert 0.0 <= r["baseline_accuracy"] <= 1.0
    # argmax prediction can never lose to majority by much (it can
    # only differ where the per-state argmax ≠ global majority)
    assert r["lift"] > -0.1
    # memoryless synthetic journeys: lift stays small
    assert abs(r["lift"]) < 0.2


def test_small_world(spark):
    r = registry.QUERIES["graph_small_world"](spark, SF).collect()[0]
    assert r["nodes"] > 0 and r["edges"] > 0
    assert 0.0 <= r["clustering"] <= 1.0
    assert r["path_len"] > 1.0
    assert r["sigma"] > 0
    # co-purchase graphs cluster above random wiring
    assert r["clustering"] > r["clustering_rand"]
