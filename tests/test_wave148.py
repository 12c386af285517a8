"""Wave 148 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_explode_outer_identity(spark):
    r = registry.QUERIES["sql_explode_outer"](spark, SF).collect()[0]
    assert r["docs"] > 0
    # the accounting identity both engines agree on
    assert r["outer_exploded_rows"] == r["exploded_rows"] + r["empty_arrays"]
    # the marker never occurs → every array is empty: the worst case
    # plain explode would drop the WHOLE table
    assert r["empty_arrays"] == r["docs"]


def test_percolation_monotone(spark):
    rows = sorted(
        registry.QUERIES["graph_percolation_curve"](spark, SF).collect(),
        key=lambda r: r["edges_removed_pct"],
    )
    assert [r["edges_removed_pct"] for r in rows] == [0, 25, 50, 75]
    shares = [r["largest_share"] for r in rows]
    # removing more edges can only shrink the giant component
    assert shares == sorted(shares, reverse=True)
    assert shares[0] > 0.9  # intact graph is nearly connected
    assert shares[-1] < shares[0]
