"""Wave 104 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_mst_forest_invariant(spark):
    r = registry.QUERIES["graph_mst_boruvka"](spark, SF).collect()[0]
    # a spanning forest has exactly nodes - components edges
    assert r["tree_edges"] == r["nodes"] - r["components"]
    assert r["components"] >= 1
    assert r["total_cost"] > 0


def test_hints_land_in_plan(spark):
    from mister_spark.operators.common import cat

    c = cat(spark, SF)
    c["orders"].createOrReplaceTempView("_h_orders")
    c["customer"].createOrReplaceTempView("_h_cust")
    rep_plan = (
        spark.sql(
            "SELECT /*+ REPARTITION(8, o_custkey) */ o_custkey, COUNT(*) n "
            "FROM _h_orders GROUP BY 1"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "hashpartitioning(o_custkey" in rep_plan
    bc_plan = (
        spark.sql(
            "SELECT /*+ BROADCAST(_h_cust) */ COUNT(*) n FROM _h_orders "
            "JOIN _h_cust ON o_custkey = c_custkey"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "broadcasthashjoin" in bc_plan
    r = registry.QUERIES["sql_hints_surface"](spark, SF).collect()[0]
    assert r["variants_agree"] == 1
    assert r["joined_rows"] > 0


def test_bounce_rate_consistency(spark):
    rows = registry.QUERIES["ev_bounce_rate"](spark, SF).collect()
    assert len(rows) == 5
    total_sessions = sum(r["sessions"] for r in rows)
    sess = registry.QUERIES["ev_sessionize"](spark, SF)
    assert total_sessions == sess.count()  # entry partition is exact
    for r in rows:
        assert 0 <= r["bounces"] <= r["sessions"]
        assert 0.0 <= r["bounce_rate"] <= 1.0
