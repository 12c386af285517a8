"""Wave 133 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_label_model_exposes_junk(spark):
    rows = {r["labeling_fn"]: r for r in
            registry.QUERIES["ml_label_model"](spark, SF).collect()}
    assert set(rows) == {
        "length_gt_median",
        "distinct_ratio_lt_median",
        "junk_hash_parity",
    }
    for r in rows.values():
        assert 0.0 <= r["est_accuracy"] <= 1.0
    # the junk LF must collapse toward chance — no ground truth used
    assert rows["junk_hash_parity"]["est_accuracy"] < 0.65
    # the correlated pair must score clearly above chance
    assert rows["length_gt_median"]["est_accuracy"] > 0.7


def test_map_ops_roundtrip(spark):
    rows = registry.QUERIES["sql_map_ops"](spark, SF).collect()
    assert sum(r["n"] for r in rows) == 1500
    assert len({(r["o_orderpriority"], r["o_orderstatus"]) for r in rows}) \
        == len(rows)


def test_control_variates(spark):
    r = registry.QUERIES["stat_control_variates"](spark, SF).collect()[0]
    assert 0.0 < r["variance_ratio"] <= 1.0 + 1e-9
    # cv mean stays close to the naive mean (unbiased correction)
    assert abs(r["cv_mean"] - r["naive_mean"]) < abs(r["naive_mean"]) * 0.1
