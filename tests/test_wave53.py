"""Wave 53 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.operators.extras53 import HITS_ITERS, HITS_TOP, hits_edges

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_bloom_never_misses(spark):
    rows = registry.QUERIES["sketch_bloom_contamination"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        # Bloom filters over-flag but never miss
        assert r["n_bloom"] >= r["n_exact"]
        assert r["n_fp"] == r["n_bloom"] - r["n_exact"]
        assert 0.0 <= r["fp_rate"] <= 1.0
        assert r["n_bloom"] <= r["n_docs"]


def test_hits_matches_numpy_power_iteration(spark):
    rows = registry.QUERIES["graph_hits"](spark, SF).collect()
    sup = [r for r in rows if r["node_type"] == "supplier"]
    cus = [r for r in rows if r["node_type"] == "customer"]
    assert len(sup) == HITS_TOP and len(cus) == HITS_TOP
    # numpy replay of the same power iteration
    edges = hits_edges(spark, SF).collect()
    srcs = sorted({e["src"] for e in edges})
    dsts = sorted({e["dst"] for e in edges})
    si = {v: i for i, v in enumerate(srcs)}
    di = {v: i for i, v in enumerate(dsts)}
    E = np.zeros((len(srcs), len(dsts)))
    for e in edges:
        E[si[e["src"]], di[e["dst"]]] = 1.0
    h = np.ones(len(srcs))
    for _ in range(HITS_ITERS):
        a = E.T @ h
        a = a / np.linalg.norm(a)
        h = E @ a
        h = h / np.linalg.norm(h)
    top_auth = {r["node_id"]: r["score"] for r in sup}
    for nid, score in top_auth.items():
        assert abs(score - a[di[nid]]) < 1e-4
    top_hub = {r["node_id"]: r["score"] for r in cus}
    for nid, score in top_hub.items():
        assert abs(score - h[si[nid]]) < 1e-4


def test_lag_features_alignment(spark):
    rows = registry.QUERIES["ml_lag_features"](spark, SF).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], {})[r["day"]] = r
    import datetime as dt

    checked_lag = 0
    for u, days in by_user.items():
        for day, r in days.items():
            assert 1 <= r["dow"] <= 7
            assert r["n"] >= 1
            d = dt.date.fromisoformat(day)
            prev = (d - dt.timedelta(days=1)).isoformat()
            if r["lag1"] is not None:
                # lag1 present => previous calendar day exists with that v
                assert prev in days
                assert abs(days[prev]["v"] - r["lag1"]) < 1e-9
                checked_lag += 1
            elif prev in days:
                raise AssertionError("lag1 NULL despite previous day present")
    assert checked_lag > 0


def test_corrupt_records_accounting(spark):
    rows = registry.QUERIES["io_corrupt_records"](spark, SF).collect()
    assert len(rows) == 3  # order statuses
    total_corrupt = sum(r["n_corrupt"] for r in rows)
    total_rows = sum(r["n_rows"] for r in rows)
    assert total_corrupt > 0  # the fixture really is dirty
    assert total_corrupt < total_rows
    for r in rows:
        assert r["total_good"] > 0
