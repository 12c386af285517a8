"""Wave 16 gates: stationary distribution vs numpy power iteration,
canonical-pick invariants, audio frame shapes, DAU/WAU invariants."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_markov_stationary_matches_numpy(spark):
    from mister_spark.operators.extras4 import ev_markov
    from mister_spark.operators.extras16 import MARKOV_ITERS

    t = ev_markov(spark, SF).collect()
    states = sorted({r.from_type for r in t} | {r.to_type for r in t})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for r in t:
        P[idx[r.from_type], idx[r.to_type]] = r.p
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(MARKOV_ITERS):
        pi = pi @ P
    got = {
        r.state: r.pi
        for r in registry.QUERIES["ev_markov_stationary"](spark, SF).collect()
    }
    for s, i in idx.items():
        assert abs(got[s] - pi[i]) < 1e-3, (s, got[s], pi[i])
    assert abs(sum(got.values()) - 1.0) < 0.01


def test_canonical_one_keeper_per_cluster(spark):
    rows = registry.QUERIES["dd_canonical"](spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster
    for cid, rs in by_cluster.items():
        keepers = [r for r in rs if r.is_canonical]
        assert len(keepers) == 1, cid
        assert all(r.keep_id == keepers[0].doc_id for r in rs), cid


def test_audio_windows_cover_payload_exactly(spark):
    from mister_spark.operators.common import cat
    from mister_spark.operators.extras16 import AUDIO_FRAME
    from pyspark.sql import functions as F

    frames = registry.QUERIES["mm_audio_windows"](spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    sizes = {
        r.doc_id: r.nb
        for r in cat(spark, SF)["documents"]
        .select("doc_id", F.octet_length(F.encode("text", "UTF-8")).alias("nb"))
        .collect()
    }
    assert set(by_doc) == set(sizes)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.frame_idx)
        assert [r.offset for r in rs] == [i * AUDIO_FRAME for i in range(len(rs))]
        assert sum(r.n_bytes for r in rs) == sizes[doc_id]
        assert all(r.n_bytes == AUDIO_FRAME for r in rs[:-1])


def test_active_users_invariants(spark):
    rows = registry.QUERIES["ev_active_users"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0 + 1e-9
