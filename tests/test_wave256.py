"""Wave 256 behavior gates beyond the registry oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_null_semantics_rules(spark):
    rows = registry.QUERIES["sql_null_semantics"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # null-safe self-equality is TRUE for every row, null or not
        assert r["nullsafe_self_eq"] == r["n"]
        # NULLIF('')->NULL->COALESCE('missing') counts the empty names
        assert r["coalesced_missing"] == r["empty_name"]
        # 3VL: NULL rows escape BOTH branches of (bal > 0)
        assert r["pos_bal"] + r["not_pos_bal"] == r["n"] - r["null_bal"]
        assert r["null_bal"] > 0  # the nullable view actually nulls


def test_struct_min_max_are_date_order_statistics(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat

    rows = {r["prio"]: r for r in registry.QUERIES["sql_struct_ops"](spark, SF).collect()}
    assert len(rows) == 5
    o = cat(spark, SF)["orders"]
    brute = {
        r["prio"]: r
        for r in o.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.min(F.struct("o_orderdate", "o_orderkey")).alias("mn"),
            F.max(F.struct("o_orderdate", "o_orderkey")).alias("mx"),
        )
        .collect()
    }
    for p, r in rows.items():
        assert r["first_orderkey"] == brute[p]["mn"]["o_orderkey"]
        assert r["last_orderkey"] == brute[p]["mx"]["o_orderkey"]


def test_interval_frame_is_trailing_3_days(spark):
    from collections import defaultdict

    from mister_spark.operators.common import cat

    rows = registry.QUERIES["w_range_interval_frame"](spark, SF).collect()
    assert rows, "some customer must have 2+ orders within 3 days"
    # brute-force one surviving customer
    target = rows[0]["custkey"]
    o = [
        r["o_orderdate"]
        for r in cat(spark, SF)["orders"]
        .filter(f"o_custkey = {target}")
        .select("o_orderdate")
        .collect()
    ]
    o.sort()
    best = max(
        sum(1 for e in o if 0 <= (d - e).days <= 3) for d in o
    )
    assert best == rows[0]["max_orders_3d"]
    assert best > 1
