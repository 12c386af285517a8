"""Wave 67 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import math
from itertools import combinations

from mister_spark import registry
from mister_spark.operators.extras67 import shapley_game

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_broadcast_side_input_plan(spark):
    from mister_spark.plans import has_broadcast_join

    df = registry.QUERIES["mr_broadcast_side_input"](spark, SF)
    assert has_broadcast_join(df)


def test_shapley_efficiency_and_replay(spark):
    rows = registry.QUERIES["ev_shapley_attribution"](spark, SF).collect()
    assert rows
    # efficiency axiom: credits sum to the grand-coalition value
    cells = shapley_game(spark, SF)
    conv_by_set = {tuple(r["chans"]): r["n_conv"] for r in cells}
    chans = sorted({c for r in cells for c in r["chans"]})
    grand = sum(
        n for s, n in conv_by_set.items() if set(s) <= set(chans)
    )
    total = sum(r["shapley_conversions"] for r in rows)
    assert abs(total - grand) < 0.01 * len(rows) + 0.01
    share = sum(r["credit_share"] for r in rows)
    assert abs(share - 1.0) < 0.01
    # independent itertools replay of one channel's value
    def v(S):
        return float(
            sum(n for s, n in conv_by_set.items() if set(s) <= set(S))
        )

    c = chans[0]
    others = [x for x in chans if x != c]
    k = len(chans)
    want = 0.0
    for r_ in range(len(others) + 1):
        for S in combinations(others, r_):
            w = (
                math.factorial(len(S))
                * math.factorial(k - len(S) - 1)
                / math.factorial(k)
            )
            want += w * (v(set(S) | {c}) - v(set(S)))
    got = {r["channel"]: r["shapley_conversions"] for r in rows}[c]
    assert abs(got - want) < 1e-3


def test_pair_explain_identities(spark):
    rows = registry.QUERIES["dd_pair_explain"](spark, SF).collect()
    assert len(rows) == 15
    jacs = [r["jaccard"] for r in rows]
    assert sorted(jacs, reverse=True) == jacs
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0 < r["jaccard"] <= 1.0
        # containments bound jaccard from above
        assert r["jaccard"] <= min(r["contain_1in2"], r["contain_2in1"]) + 1e-6
        assert 0 < r["size_ratio"] <= 1.0


def test_metadata_count_agrees(spark):
    r = registry.QUERIES["io_metadata_count"](spark, SF).collect()[0]
    assert r["agree"] == 1
    assert r["n_rows"] == r["n_rows_meta"] > 0
