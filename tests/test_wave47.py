"""Wave 47 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import duckdb

from mister_spark import registry
from mister_spark.operators.extras47 import COP_BASKET_CAP, COP_SUPPORT

registry.load_all()

SF = "/root/testdata/sf0.001"


def _exact_components(sf):
    """Union-find over the same capped co-purchase edge list."""
    edges = duckdb.sql(
        f"""
        WITH raw AS (SELECT DISTINCT l_orderkey, l_partkey
                     FROM '{sf}/lineitem.parquet'),
        bk AS (SELECT l_orderkey, l_partkey FROM (
                 SELECT l_orderkey, l_partkey,
                        ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_partkey) AS rk
                 FROM raw) WHERE rk <= {COP_BASKET_CAP})
        SELECT x.l_partkey, y.l_partkey
        FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}
        """
    ).fetchall()
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comps[r] = comps.get(r, 0) + 1
    return comps


def test_components_match_union_find(spark):
    """The distributed hash-to-min result must equal an exact
    union-find: same (min-root, size) multiset for the top-20."""
    exact = _exact_components(SF)
    want = sorted(
        ((root, size) for root, size in exact.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r["component"], r["n_nodes"])
        for r in registry.QUERIES["graph_components"](spark, SF).collect()
    ]
    assert got == want


def test_copurchase_weights_positive_sorted(spark):
    rows = registry.QUERIES["graph_copurchase"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    ws = [r["w"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    assert all(w >= COP_SUPPORT for w in ws)
    assert all(r["p1"] < r["p2"] for r in rows)


def test_jaccard_bounds(spark):
    rows = registry.QUERIES["graph_jaccard_neighbors"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["u"] < r["v"]


def test_reciprocity_consistency(spark):
    r = registry.QUERIES["graph_reciprocity"](spark, SF).collect()[0]
    assert r["n_reciprocated"] == 2 * r["n_mutual_pairs"]
    assert 0.0 <= r["reciprocity"] <= 1.0
    assert r["n_edges"] >= r["n_reciprocated"]
