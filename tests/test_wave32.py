"""Wave 32 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_asof_tolerance_subsets_untolerated(spark):
    """Tolerance can only null out matches: every tolerated match must
    equal the plain as-of's match, matched=0 rows must be exactly the
    purchases whose plain match is absent or older than the bound."""
    from mister_spark.operators.extras32 import ASOF_TOL_US

    plain = {
        r["purchase_id"]: r["signup_us"]
        for r in registry.QUERIES["ev_asof_join"](spark, SF).collect()
    }
    tol = registry.QUERIES["j_asof_tolerance"](spark, SF).collect()
    assert {r["purchase_id"] for r in tol} == set(plain)
    assert any(r["matched"] == 1 for r in tol)
    for r in tol:
        base = plain[r["purchase_id"]]
        if r["matched"] == 1:
            assert r["signup_us"] == base
            assert r["purchase_us"] - r["signup_us"] <= ASOF_TOL_US
        else:
            assert r["signup_us"] is None
            assert base is None or r["purchase_us"] - base > ASOF_TOL_US


def test_calibration_bins_partition_the_data(spark):
    """Bins tile [0,1]: counts sum to the table size, mean_pred lies in
    its bin's range, every rate in [0,1]."""
    from mister_spark.catalog import Catalog

    total = Catalog(spark, SF)["embeddings"].count()
    rows = registry.QUERIES["ml_calibration_bins"](spark, SF).collect()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0
        assert lo - 1e-4 <= r["mean_pred"] <= hi + 1e-4, r
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert abs(r["gap"] - round(abs(r["mean_pred"] - r["pos_rate"]), 4)) <= 1e-9


def test_uptime_bounded_and_matches_interval_arithmetic(spark):
    """Uptime in (0, 1]; covered_us never exceeds a day; spot-check one
    day against a driver-side merge of its raw intervals."""
    from mister_spark.operators.extras32 import DAY_US, SLA_PAD_US

    rows = registry.QUERIES["ev_uptime_sla"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["covered_us"] <= DAY_US
        assert 0 < r["uptime"] <= 1.0
    # independent merge for the busiest day
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    target = max(rows, key=lambda r: r["covered_us"])
    ev = (
        Catalog(spark, SF)["events"]
        .select(F.expr("unix_micros(ts)").alias("st"))
        .collect()
    )
    lo, hi = target["day"] * DAY_US, (target["day"] + 1) * DAY_US
    ivs = sorted(
        (max(r["st"], lo), min(r["st"] + SLA_PAD_US, hi))
        for r in ev
        if r["st"] + SLA_PAD_US > lo and r["st"] < hi
    )
    covered, cur_s, cur_e = 0, None, None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    assert covered == target["covered_us"]
