"""Wave 20 gates: the forget report must agree with an actual anti-join
deletion, the table diff must partition the key universe, Levene must be
non-negative."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_forget_report_matches_actual_anti_join(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat
    from mister_spark.operators.extras20 import FORGET_MOD

    rows = {r.table_name: r for r in registry.QUERIES["ds_forget_users"](spark, SF).collect()}
    ev = cat(spark, SF)["events"]
    forget = ev.filter(F.col("user_id") % FORGET_MOD == 0).select("user_id").distinct()
    kept = ev.join(F.broadcast(forget), "user_id", "left_anti").count()
    r = rows["events"]
    assert r.n_after == kept, (r, kept)
    assert r.n_before - r.n_deleted == r.n_after
    # and no forgotten user survives the deletion plan
    survivors = (
        ev.join(F.broadcast(forget), "user_id", "left_anti")
        .filter(F.col("user_id") % FORGET_MOD == 0)
        .count()
    )
    assert survivors == 0


def test_table_diff_partitions_key_universe(spark):
    from mister_spark.operators.common import cat

    rows = {r.status: r.n for r in registry.QUERIES["ds_table_diff"](spark, SF).collect()}
    n_orders = cat(spark, SF)["orders"].count()
    # every order key appears exactly once across the four classes
    assert sum(rows.values()) == n_orders
    assert rows.get("added", 0) > 0 and rows.get("changed", 0) > 0
    assert rows.get("removed", 0) == 0  # new snapshot contains all keys


def test_levene_nonnegative(spark):
    r = registry.QUERIES["stat_levene"](spark, SF).collect()[0]
    assert r.levene_w >= 0.0
    assert r.k >= 2 and r.nt > r.k
