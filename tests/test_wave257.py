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
