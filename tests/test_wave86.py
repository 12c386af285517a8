"""Wave 86 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras86 import dtw_banded

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_adamic_adar_scores(spark):
    rows = registry.QUERIES["graph_adamic_adar"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["adamic_adar"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["u"] < r["v"]
        assert r["shared"] >= 1
        # each shared neighbor contributes at most 1/ln(2)
        assert r["adamic_adar"] <= r["shared"] / 0.693 + 1e-6


def test_bartlett_stat(spark):
    r = registry.QUERIES["stat_bartlett"](spark, SF).collect()[0]
    assert r["groups"] == 5
    assert r["dof"] == 4
    assert r["bartlett_t"] >= 0.0


def test_dtw_vs_l1_and_identity(spark):
    r = registry.QUERIES["ev_dtw_distance"](spark, SF).collect()[0]
    # warping can only reduce cost vs the rigid alignment
    assert r["dtw"] <= r["l1"] + 1e-9
    assert r["n_days"] > 0
    # pure-python DP identity check
    assert dtw_banded([1.0, 2.0, 3.0], [1.0, 2.0, 3.0], 2) == 0.0
    # classic shift example: banded DTW absorbs the phase shift
    a = [0.0, 1.0, 2.0, 1.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 2.0, 1.0, 0.0]
    assert dtw_banded(a, b, 2) < sum(abs(x - y) for x, y in zip(a, b))


def test_ann_recall_curve_monotone(spark):
    rows = sorted(
        registry.QUERIES["sim_ann_recall_curve"](spark, SF).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    recalls = [r["recall"] for r in rows]
    for a, b in zip(recalls, recalls[1:]):
        assert b >= a - 1e-9
    # probing every cluster IS the exact scan
    assert recalls[-1] == 1.0
