"""Wave 22 gates: band-join decomposition, adoption monotonicity,
burstiness bounds."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pct_band_join_is_grid_equi_join(spark):
    """The candidate match must be a cell equi-join; the only
    nested-loop allowed is the 1-row max-price scalar broadcast."""
    plan = physical_plan(registry.QUERIES["j_pct_band_join"](spark, SF))
    assert "CartesianProduct" not in plan
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("BroadcastNestedLoopJoin") <= 2, phys
    assert "cell" in phys, phys


def test_band_join_symmetric_on_self(spark):
    """If A matches B then B's price is within A's band too — only when
    both are probes does the pair appear twice; spot-check the band
    predicate holds for every emitted pair."""
    from mister_spark.operators.common import cat
    from mister_spark.operators.extras22 import BAND_PCT

    prices = {
        r.p_partkey: r.p_retailprice
        for r in cat(spark, SF)["part"].select("p_partkey", "p_retailprice").collect()
    }
    rows = registry.QUERIES["j_pct_band_join"](spark, SF).collect()
    assert rows
    for r in rows:
        probe_price = prices[r.probe_key]
        assert (
            probe_price * (1 - BAND_PCT / 100)
            <= prices[r.match_key]
            <= probe_price * (1 + BAND_PCT / 100)
        ), r


def test_adoption_curve_monotone_and_total(spark):
    from mister_spark.operators.common import cat
    from pyspark.sql import functions as F

    rows = sorted(
        registry.QUERIES["ev_adoption_curve"](spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert rows
    prev = 0
    for r in rows:
        assert r.cum_users == prev + r.n_new
        prev = r.cum_users
    n_users = (
        cat(spark, SF)["events"].select(F.countDistinct("user_id")).first()[0]
    )
    assert prev == n_users


def test_burstiness_bounded(spark):
    for r in registry.QUERIES["ev_burstiness"](spark, SF).collect():
        assert -1.0 < r.burstiness < 1.0
        assert r.fano >= 0.0
