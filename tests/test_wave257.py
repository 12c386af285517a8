"""Wave 257 behavior gates beyond the registry oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_triad_lookup_is_complete_and_canonical():
    from itertools import permutations

    from mister_spark.operators.extras257 import _PAIRS, TRIAD_LABELS

    assert set(TRIAD_LABELS) == set(range(64))
    assert len(set(TRIAD_LABELS.values())) == 16
    # permutation invariance: relabeling nodes never changes the class
    for code in range(64):
        adj = {
            (x, y): (code >> i) & 1 for i, (x, y) in enumerate(_PAIRS)
        }
        for p in permutations(range(3)):
            c = 0
            for i, (x, y) in enumerate(_PAIRS):
                c |= adj[(p[x], p[y])] << i
            assert TRIAD_LABELS[c] == TRIAD_LABELS[code]
    # the named anchors
    assert TRIAD_LABELS[0] == "003"
    assert TRIAD_LABELS[63] == "300"
    assert TRIAD_LABELS[21] == "030T"
    assert TRIAD_LABELS[25] == "030C"


def test_triad_updown_labels_from_explicit_edge_sets():
    """Pin U/D orientation to explicit edge sets (Holland-Leinhardt).

    021D is the out-star (one source -> two sinks); adding a mutual
    dyad between the two sinks yields 120D (the third node points at
    both dyad members).  021U is the in-star; 120U is the in-star plus
    a mutual dyad between the two sources.
    """
    from mister_spark.operators.extras257 import _PAIRS, TRIAD_LABELS

    bit = {pair: i for i, pair in enumerate(_PAIRS)}

    def code(edges):
        c = 0
        for e in edges:
            c |= 1 << bit[e]
        return c

    # out-star: node 1 -> {0, 2}
    assert TRIAD_LABELS[code([(1, 0), (1, 2)])] == "021D"
    # in-star: {0, 2} -> node 1
    assert TRIAD_LABELS[code([(0, 1), (2, 1)])] == "021U"
    # mutual 0<->1, both members -> 2  (in-star at 2 + M)
    assert TRIAD_LABELS[code([(0, 1), (1, 0), (0, 2), (1, 2)])] == "120U"
    # mutual 0<->1, third 2 -> both members  (out-star at 2 + M)
    assert TRIAD_LABELS[code([(0, 1), (1, 0), (2, 0), (2, 1)])] == "120D"
    # mutual 0<->1 + directed path through the third
    assert TRIAD_LABELS[code([(0, 1), (1, 0), (0, 2), (2, 1)])] == "120C"


def test_triad_census_totals(spark):
    import math

    rows = registry.QUERIES["graph_triad_census"](spark, SF).collect()
    total = sum(r["n_triples"] for r in rows)
    # totals must equal C(n, 3) for the node count implied by pairs
    # n(n-1)(n-2)/6 == total for some integer n
    n = round((6 * total) ** (1 / 3)) + 1
    assert any(
        math.comb(k, 3) == total for k in range(3, 40)
    ), total
    assert len(rows) >= 2  # thresholded graph is not complete-mutual


def test_gamma_glm_fit_sane(spark):
    r = registry.QUERIES["stat_gamma_glm"](spark, SF).collect()[0]
    # synthetic prices are ~item-independent, so the multiplier sits
    # near 1; the gate pins convergence sanity, not TPC-H pricing
    assert 0.5 < r["price_mult_per_item"] < 2.0
    assert r["dispersion"] > 0
    assert r["n"] > 100
