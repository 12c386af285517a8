"""Wave 63 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pseudonymize_bijective(spark):
    rows = registry.QUERIES["io_pseudonymize"](spark, SF).collect()
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_users
    assert all(r["bijective"] == 1 for r in rows)
    tokens = {r["token"] for r in rows}
    assert len(tokens) == n_users  # no collisions
    for t in tokens:
        assert len(t) == 32  # md5 hex, no raw ids leaking


def test_mcnemar_outputs(spark):
    r = registry.QUERIES["stat_mcnemar"](spark, SF).collect()[0]
    assert r["a_only_right"] + r["b_only_right"] <= r["n"]
    assert r["chi2"] >= 0
    assert 0.0 <= r["p_value"] <= 1.0


def test_platt_monotone_and_better_nll(spark):
    from mister_spark.operators.extras55 import iso_bins

    rows = sorted(
        registry.QUERIES["ml_platt_scaling"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    a = {r["coef_a"] for r in rows}
    assert len(a) == 1
    # sigmoid of A*s+B with A>0 is strictly increasing in bin
    probs = [r["rate_platt"] for r in rows]
    if a.pop() > 0:
        assert all(x <= y + 1e-9 for x, y in zip(probs, probs[1:]))
    # NLL under the fitted sigmoid beats the constant-rate baseline
    src = {r["bin"]: r for r in iso_bins(spark, SF).collect()}
    tot = sum(r["n"] for r in src.values())
    pos = sum(r["n_pos"] for r in src.values())
    base = pos / tot
    nll_base = nll_platt = 0.0
    for r in rows:
        b = src[r["bin"]]
        p = min(max(r["rate_platt"], 1e-6), 1 - 1e-6)
        nll_platt -= b["n_pos"] * math.log(p) + (b["n"] - b["n_pos"]) * math.log(
            1 - p
        )
        nll_base -= b["n_pos"] * math.log(base) + (
            b["n"] - b["n_pos"]
        ) * math.log(1 - base)
    assert nll_platt <= nll_base + 1.0


def test_absorbing_markov_replay(spark):
    rows = registry.QUERIES["ml_absorbing_markov"](spark, SF).collect()
    assert len(rows) == 4  # 5 event types minus the absorbing one
    for r in rows:
        assert r["exp_steps"] > 0
        assert 0.0 <= r["p_absorb"] <= 1.0
    # with purchase reachable from every state, absorption is certain
    assert all(r["p_absorb"] > 0.99 for r in rows)
