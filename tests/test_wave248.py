"""Wave 248 behavior gates beyond the registry oracle parity.

Dunn's test must flag exactly the pairs that straddle a planted
separation (and keep BH-adjusted p at or above raw p); Kelly must read
a no-loss stream as full fraction, a dominated stream as positive, and
a symmetric wobble as near zero.
"""

from __future__ import annotations

import datetime
import os


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderdate string, o_totalprice double",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )


def test_dunn_flags_the_separated_group(spark, tmp_path):
    from mister_spark.operators.extras248 import stat_dunn_test

    rows, oid = [], 0
    # group A sits far below B and C; B and C interleave
    for i in range(60):
        oid += 1
        rows.append((oid, 1, "A", "2024-01-01", 10.0 + (i % 7)))
    for i in range(60):
        oid += 1
        rows.append((oid, 1, "B", "2024-01-01", 100.0 + (i % 11)))
    for i in range(60):
        oid += 1
        rows.append((oid, 1, "C", "2024-01-01", 101.0 + (i % 11)))
    _write_orders(spark, tmp_path, rows)
    out = {
        (r["g1"], r["g2"]): r
        for r in stat_dunn_test(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")]["significant"] == 1
    assert out[("A", "C")]["significant"] == 1
    assert out[("B", "C")]["significant"] == 0, out[("B", "C")]
    for r in out.values():
        assert r["p_bh"] >= r["p_raw"] - 1e-9  # BH never shrinks p
        assert r["mean_rank_1"] != r["mean_rank_2"] or r["z_score"] == 0


def _write_revenue(spark, tmp_path, daily_cents):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (
            i + 1,
            1,
            "P",
            (d0 + datetime.timedelta(days=i)).strftime("%Y-%m-%d"),
            c / 100.0,
        )
        for i, c in enumerate(daily_cents)
    ]
    _write_orders(spark, tmp_path, rows)


def test_kelly_reads_edge_and_its_absence(spark, tmp_path):
    from mister_spark.operators.extras248 import fin_kelly

    # strictly growing: no losing day -> full Kelly sentinel
    cents = [100000]
    for _ in range(20):
        cents.append(int(cents[-1] * 1.02))
    _write_revenue(spark, tmp_path, cents)
    r = fin_kelly(spark, str(tmp_path)).collect()[0]
    assert r["win_rate"] == 1.0
    assert r["kelly_discrete"] == 1.0
    assert r["kelly_continuous"] > 0

    # +4% / -1% alternation: strong positive edge, partial fraction
    cents2 = [100000]
    for i in range(30):
        cents2.append(int(cents2[-1] * (1.04 if i % 2 == 0 else 0.99)))
    _write_revenue(spark, tmp_path, cents2)
    r2 = fin_kelly(spark, str(tmp_path)).collect()[0]
    assert 0 < r2["kelly_discrete"] < 1, r2
    assert r2["payoff_ratio"] > 3, r2

    # symmetric up/down: win rate one half, Kelly near zero
    cents3 = [100000]
    for i in range(40):
        cents3.append(int(cents3[-1] * (1.02 if i % 2 == 0 else 1 / 1.02)))
    _write_revenue(spark, tmp_path, cents3)
    r3 = fin_kelly(spark, str(tmp_path)).collect()[0]
    assert abs(r3["win_rate"] - 0.5) < 0.05
    assert abs(r3["kelly_discrete"]) < 0.15, r3
