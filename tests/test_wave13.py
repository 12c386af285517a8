"""Wave 13 gates: k-core vs a python peel, ridge vs numpy normal
equations, streaming quota vs the batch row_number window, and
curriculum phase invariants."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_k_core_matches_python_peel(spark):
    from mister_spark.operators.extras9 import _undirected_edges
    from mister_spark.operators.extras13 import K_CORE

    edges = {
        (r.a, r.b) for r in _undirected_edges(spark, SF).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    # iterative peel
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < K_CORE:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    ref = {n: len(ns) for n, ns in adj.items() if ns}

    got = {
        r.node: r.core_degree
        for r in registry.QUERIES["graph_k_core"](spark, SF).collect()
    }
    assert got == ref, (got, ref)
    # the chosen k must actually peel something at this SF, or the test
    # can't distinguish a broken loop from a dense graph
    n_nodes = len({a for a, _ in edges})
    assert len(ref) < n_nodes, "K_CORE peels nothing — raise it"


def test_ridge_matches_numpy(spark):
    import duckdb

    from mister_spark.operators.extras13 import RIDGE_LAMBDA

    got = {
        r.dim: r.weight for r in registry.QUERIES["ml_ridge"](spark, SF).collect()
    }
    rows = duckdb.sql(
        f"SELECT embedding, label % 2 FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = np.hstack([X, np.ones((len(X), 1))])
    y = np.array([r[1] for r in rows], dtype=np.float64)
    w = np.linalg.solve(X.T @ X + RIDGE_LAMBDA * np.eye(X.shape[1]), X.T @ y)
    for i, wi in enumerate(w):
        assert abs(got[i] - wi) < 1e-4, (i, got[i], wi)


def test_stream_quota_matches_batch_window(spark):
    from pyspark.sql import Window as W, functions as F

    from mister_spark.operators.common import cat
    from mister_spark.streaming.jobs import QUOTA_K

    got = {
        (r.user_id, r.event_id, r.k_index)
        for r in registry.QUERIES["stream_quota"](spark, SF).collect()
    }
    ev = cat(spark, SF)["events"]
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    want = {
        (r.user_id, r.event_id, r.k)
        for r in ev.select(
            "user_id", "event_id", F.row_number().over(w).alias("k")
        )
        .filter(F.col("k") <= QUOTA_K)
        .collect()
    }
    assert got == want, (len(got), len(want))


def test_curriculum_phases_are_ordered_and_total(spark):
    from mister_spark.operators.common import cat

    rows = sorted(
        registry.QUERIES["ds_curriculum"](spark, SF).collect(), key=lambda r: r.phase
    )
    assert [r.phase for r in rows] == [1, 2, 3, 4]
    assert sum(r.n_docs for r in rows) == cat(spark, SF)["documents"].count()
    for a, b in zip(rows, rows[1:]):
        assert a.max_chars <= b.min_chars + 1, (a, b)
