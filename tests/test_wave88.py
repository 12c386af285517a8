"""Wave 88 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_hist_tree_partition(spark):
    rows = registry.QUERIES["ml_hist_tree"](spark, SF).collect()
    assert 2 <= len(rows) <= 4
    n_total = sum(r["n"] for r in rows)
    orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert n_total == orders  # leaves partition the data exactly
    assert all(r["root_gain"] >= 0 for r in rows)
    assert all(r["prediction"] > 0 for r in rows)
    # leaf predictions differ (the split did something)
    assert len({r["prediction"] for r in rows}) > 1


def test_dist_fit_compare_rows(spark):
    rows = registry.QUERIES["stat_dist_fit_compare"](spark, SF).collect()
    by = {r["dist"]: r for r in rows}
    assert set(by) == {"exponential", "normal", "lognormal"}
    for r in rows:
        assert 0.0 <= r["ks"] <= 1.0
    # bounded uniform-ish prices: the exponential (heavy right tail
    # from 0) must fit clearly worse than the normal
    assert by["exponential"]["ks"] > by["normal"]["ks"]


def test_ams_f2(spark):
    r = registry.QUERIES["sketch_ams_f2"](spark, SF).collect()[0]
    assert r["f2_exact"] > 0
    assert r["f2_est"] > 0
    # 5-row median over 5 types: loose but real accuracy bound
    assert r["rel_error"] < 1.5


def test_clip_filter_funnel(spark):
    r = registry.QUERIES["mm_clip_filter"](spark, SF).collect()[0]
    assert r["candidates"] > 0
    for gate in ("pass_text", "pass_norm", "pass_sim"):
        assert 0 <= r[gate] <= r["candidates"]
    assert r["kept"] <= min(r["pass_text"], r["pass_norm"], r["pass_sim"])
    assert abs(r["keep_rate"] - round(r["kept"] / r["candidates"], 4)) < 1e-3
