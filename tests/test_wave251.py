"""Wave 251 behavior gates beyond the registry oracle parity.

Survival invariants on the rebuy clock (at-risk pools telescope, the
cumulative hazard is nondecreasing, observed events reconcile with the
expectation sum) and a Black-Scholes sanity panel (monotonicity in
strike, put-call parity, intrinsic-value lower bound).
"""

from __future__ import annotations

import math

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_log_rank_reconciles(spark):
    rows = {
        r["grp"]: r for r in registry.QUERIES["stat_log_rank"](spark, SF).collect()
    }
    assert set(rows) == {"building", "other"}
    b, o = rows["building"], rows["other"]
    # both rows carry the same chi2, and O/E totals reconcile
    assert b["chi2"] == o["chi2"] and b["chi2"] >= 0
    assert abs(
        (b["observed"] + o["observed"]) - (b["expected"] + o["expected"])
    ) < 0.01
    assert b["n_customers"] > 0 and o["n_customers"] > 0
    assert b["observed"] <= b["n_customers"]


def test_nelson_aalen_monotone_and_bounded(spark):
    from collections import defaultdict

    rows = registry.QUERIES["stat_nelson_aalen"](spark, SF).collect()
    by_seg = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["seg"], r["day"])):
        by_seg[r["seg"]].append(r)
    assert len(by_seg) == 5
    for seg, rs in by_seg.items():
        prev_h, prev_risk = -1.0, None
        for r in rs:
            assert 0 <= r["day"] <= 365, (seg, r["day"])
            assert r["events"] >= 1
            assert r["n_at_risk"] >= r["events"]
            assert r["cum_hazard"] >= prev_h - 1e-9, (seg, r["day"])
            prev_h = r["cum_hazard"]
            if prev_risk is not None:
                assert r["n_at_risk"] <= prev_risk  # at-risk only shrinks
            prev_risk = r["n_at_risk"]


def test_black_scholes_grid_sanity(spark):
    rows = registry.QUERIES["fin_black_scholes"](spark, SF).collect()
    from mister_spark.operators.extras251 import BS_RATE, BS_S0, BS_T

    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["seg"], []).append(r)
    assert len(by_seg) == 5
    disc = math.exp(-BS_RATE * BS_T)
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r["strike"])
        assert [r["strike"] for r in rs] == [80, 90, 100, 110, 120]
        sigma = rs[0]["sigma_ann"]
        assert sigma > 0 and all(r["sigma_ann"] == sigma for r in rs)
        for a, b in zip(rs, rs[1:]):
            assert a["call_price"] > b["call_price"]  # calls fall in K
            assert a["put_price"] < b["put_price"]  # puts rise in K
        for r in rs:
            # intrinsic lower bound and put-call parity
            assert r["call_price"] >= max(0.0, BS_S0 - r["strike"] * disc) - 1e-3
            parity = r["call_price"] - r["put_price"] - (
                BS_S0 - r["strike"] * disc
            )
            assert abs(parity) < 1e-3, (seg, r["strike"], parity)
