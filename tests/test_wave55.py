"""Wave 55 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math

from mister_spark import registry
from mister_spark.operators.extras55 import (
    SSSP_ROUNDS,
    SSSP_TOP,
    iso_bins,
    sssp_edges,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_granger_outputs(spark):
    r = registry.QUERIES["stat_granger"](spark, SF).collect()[0]
    assert r["n_days"] > 10
    assert r["f_stat"] >= 0
    assert 0.0 <= r["p_value"] <= 1.0
    assert r["causal_flag"] in (0, 1)


def test_domain_reweight_distribution(spark):
    rows = registry.QUERIES["ds_domain_reweight"](spark, SF).collect()
    assert len(rows) == 20
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 0.01  # rounding slack across 20 rows
    for r in rows:
        assert r["weight"] > 0
        assert r["nll"] > 0
    # monotone link: the most surprising domain gets weight above its
    # raw share, the least surprising below
    n_tokens = sum(r["n_tokens"] for r in rows)
    hi = max(rows, key=lambda r: r["excess"])
    lo = min(rows, key=lambda r: r["excess"])
    assert hi["weight"] > hi["n_tokens"] / n_tokens
    assert lo["weight"] < lo["n_tokens"] / n_tokens


def test_isotonic_monotone_and_mass_conserving(spark):
    rows = registry.QUERIES["ml_isotonic_calibration"](spark, SF).collect()
    assert rows
    rates = [r["rate_iso"] for r in sorted(rows, key=lambda r: r["bin"])]
    assert all(a <= b + 1e-9 for a, b in zip(rates, rates[1:]))
    # pooled mass conservation: sum n*rate_iso == total positives
    src = {r["bin"]: r for r in iso_bins(spark, SF).collect()}
    total_pos = sum(r["n_pos"] for r in src.values())
    got = sum(r["n"] * r["rate_iso"] for r in rows)
    assert abs(got - total_pos) < 0.01 * len(rows) + 1
    for r in rows:
        assert r["n"] == src[r["bin"]]["n"]
        assert 0.0 <= r["rate_iso"] <= 1.0


def test_sssp_matches_bounded_bellman_ford(spark):
    edges = sssp_edges(spark, SF).collect()
    src = min(e["src"] for e in edges)
    dist = {src: 0.0}
    adj = {}
    for e in edges:
        adj.setdefault(e["src"], []).append((e["dst"], e["d"]))
    for _ in range(SSSP_ROUNDS):
        nd = dict(dist)
        for u, d0 in dist.items():
            for v, w in adj.get(u, []):
                if d0 + w < nd.get(v, math.inf):
                    nd[v] = d0 + w
        dist = nd
    want = sorted(
        ((math.floor(d * 1e6 + 0.5) / 1e6, n) for n, d in dist.items())
    )[:SSSP_TOP]
    got = [
        (r["dist"], r["node"])
        for r in registry.QUERIES["graph_sssp_weighted"](spark, SF).collect()
    ]
    assert got == want
