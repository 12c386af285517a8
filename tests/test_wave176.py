"""Wave 176 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cochran_q_matches_scipy_free_replay(spark):
    """Replay Cochran's Q in plain Python from the per-customer flags."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    o = Catalog(spark, SF)["orders"]
    flags = (
        o.groupBy("o_custkey")
        .agg(
            *[
                F.max(
                    F.when(F.year("o_orderdate") == y, 1).otherwise(0)
                ).alias(f"y{y}")
                for y in (1995, 1996, 1997)
            ]
        )
        .collect()
    )
    g = [sum(r[f"y{y}"] for r in flags) for y in (1995, 1996, 1997)]
    ls = [r["y1995"] + r["y1996"] + r["y1997"] for r in flags]
    mean_g = sum(g) / 3
    want = (
        3 * 2 * sum((gj - mean_g) ** 2 for gj in g)
        / (3 * sum(ls) - sum(l * l for l in ls))
    )
    r = registry.QUERIES["stat_cochran_q"](spark, SF).collect()[0]
    assert abs(r["q_stat"] - want) < 0.001
    assert (r["q_stat"] > 5.991465) == bool(r["reject_5pct"])
    assert (
        r["active_1995"],
        r["active_1996"],
        r["active_1997"],
    ) == tuple(g)


def test_trading_day_adjustment(spark):
    rows = registry.QUERIES["ev_trading_day_adjust"](spark, SF).collect()
    assert len(rows) >= 70  # ~80 months of data
    # indices hover around 1 (the adjustment removes composition, the
    # residual is genuine month effect + noise)
    idx = [r["td_adjusted_index"] for r in rows]
    assert 0.9 < sum(idx) / len(idx) < 1.1
    assert all(r["expected_rev"] > 0 for r in rows)
    assert all(1 <= r["days"] <= 31 for r in rows)
