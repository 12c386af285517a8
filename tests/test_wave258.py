"""Wave 258 behavior gates beyond the registry oracle parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_lead_lag_matrix_shape_and_bounds(spark):
    rows = registry.QUERIES["ev_lead_lag_matrix"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) ordered pairs
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert -7 <= r["best_lag"] <= 7
        assert -1.0 <= r["best_corr"] <= 1.0
        want = (
            "a_leads"
            if r["best_lag"] > 0
            else ("b_leads" if r["best_lag"] < 0 else "sync")
        )
        assert r["direction"] == want


def test_lead_lag_planted_shift(spark, tmp_path):
    """A series planted as an exact 2-day shift of another must be
    detected at best_lag = ±2 with |corr| ~ 1."""
    import os

    from mister_spark.operators.extras258 import ev_lead_lag_matrix

    rows = []
    base = [3, 9, 1, 7, 5, 8, 2, 6, 4, 9, 1, 5, 7, 3, 8]
    eid = 0
    for day, n in enumerate(base):
        for _ in range(n):
            eid += 1
            rows.append((eid, day * 86400_000_000, 1, "alpha", 1.0, "{}"))
    for day, n in enumerate(base):
        for _ in range(n):
            eid += 1
            # beta repeats alpha two days LATER
            rows.append((eid, (day + 2) * 86400_000_000, 1, "beta", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id", "event_type",
        "value", "props"
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = {
        (r["type_a"], r["type_b"]): r
        for r in ev_lead_lag_matrix(spark, str(tmp_path)).collect()
    }
    r = out[("alpha", "beta")]
    assert r["best_lag"] == 2, r
    assert r["best_corr"] > 0.9
    assert r["direction"] == "a_leads"


def test_cuzick_trend_fields(spark):
    r = registry.QUERIES["stat_cuzick_trend"](spark, SF).collect()[0]
    assert r["n"] > 1000
    assert 0.0 <= r["p_value"] <= 1.0
    # synthetic priorities don't price-discriminate: |z| modest
    assert abs(r["z"]) < 5.0
    assert r["l_stat"] > 0 and r["expected"] > 0
