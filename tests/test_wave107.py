"""Wave 107 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_retention_decay_fit(spark):
    r = registry.QUERIES["ev_retention_decay_fit"](spark, SF).collect()[0]
    assert r["c"] > 0
    assert 0.0 <= r["projected_d30"] <= 1.5
    # high-retention synthetic users: decay exists but is shallow
    assert -1.0 < r["beta"] < 2.0


def test_rowgroup_tuning_tradeoff(spark):
    rows = {
        r["layout"]: r
        for r in registry.QUERIES["io_rowgroup_tuning"](spark, SF).collect()
    }
    assert set(rows) == {"small", "large"}
    # smaller groups → more groups and at least as much skippability
    assert rows["small"]["row_groups"] >= rows["large"]["row_groups"]
    assert rows["small"]["skip_fraction"] >= rows["large"]["skip_fraction"]
    for r in rows.values():
        assert 0 <= r["skippable_groups"] <= r["row_groups"]


def test_degree_powerlaw(spark):
    r = registry.QUERIES["graph_degree_powerlaw"](spark, SF).collect()[0]
    assert r["nodes"] > 0
    assert r["max_degree"] >= 1
    assert r["hill_alpha"] > 0
