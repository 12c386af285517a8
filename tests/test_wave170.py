"""Wave 170 behavior gates (j_allen_relations parity is in
test_oracle_parity; betweenness replays Brandes exactly in Python)."""

from __future__ import annotations

from collections import defaultdict, deque

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_allen_relations_census(spark):
    rows = registry.QUERIES["j_allen_relations"](spark, SF).collect()
    allowed = {
        "equals", "meets", "met_by", "starts", "started_by", "finishes",
        "finished_by", "during", "contains", "overlaps", "overlapped_by",
    }
    assert rows
    assert {r["relation"] for r in rows} <= allowed
    assert all(r["pairs"] > 0 for r in rows)
    # ±2-min windows inside 30-min-gap sessions: containment dominates
    by = {r["relation"]: r["pairs"] for r in rows}
    assert by.get("during", 0) >= max(by.values()) * 0.5


def _brandes(adj, sources):
    """Textbook Brandes (public algorithm) restricted to `sources`."""
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {n: v / 2.0 for n, v in bc.items()}


def test_betweenness_matches_python_brandes(spark):
    from mister_spark.operators.extras47 import _copurchase_edges
    from mister_spark.operators.extras170 import BW_SOURCES

    edges = _copurchase_edges(spark, SF).select("p1", "p2").collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["p1"]].add(r["p2"])
        adj[r["p2"]].add(r["p1"])
    sources = sorted(adj)[:BW_SOURCES]
    want = _brandes(adj, sources)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = registry.QUERIES["graph_betweenness_sampled"](spark, SF).collect()
    assert len(got) == 10
    for row, (node, val) in zip(got, top):
        assert row["node"] == node, (row, node)
        assert abs(row["betweenness"] - val) < 0.01, (row, val)
