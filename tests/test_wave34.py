"""Wave 34 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_session_stats_percentiles_ordered(spark):
    row = registry.QUERIES["ev_session_stats"](spark, SF).collect()[0]
    assert row["n_sessions"] > 0
    assert 0 <= row["p50_s"] <= row["p90_s"] <= row["p99_s"]
    assert row["mean_s"] >= 0


def test_alert_throttle_matches_python_fold(spark):
    """The applyInPandas fold must equal a driver-side reference replay
    for every user, and throttling must actually suppress something."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras34 import ALERT_COOLDOWN_US

    ev = (
        Catalog(spark, SF)["events"]
        .filter(F.col("event_type") == "error")
        .select("user_id", F.expr("unix_micros(ts)").alias("tus"))
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["tus"])
    want = {}
    for u, ts in by_user.items():
        ts.sort()
        fired, last, first = 0, None, None
        for t in ts:
            if last is None or t - last > ALERT_COOLDOWN_US:
                fired += 1
                last = t
                first = t if first is None else first
        want[u] = (len(ts), fired, first, last)
    got = {
        r["user_id"]: (
            r["n_errors"],
            r["n_alerts"],
            r["first_alert_us"],
            r["last_alert_us"],
        )
        for r in registry.QUERIES["ev_alert_throttle"](spark, SF).collect()
    }
    assert got == want
    assert any(g[1] < g[0] for g in got.values()), "no suppression exercised"


def test_rows_vs_range_diverge_on_date_ties(spark):
    """The two frames must agree on tie-free customers and differ
    somewhere (same-date orders exist in the testdata) — and RANGE ≥
    ROWS everywhere except the last peer of each date group."""
    rows = registry.QUERIES["w_rows_vs_range"](spark, SF).collect()
    assert any(abs(r["running_rows"] - r["running_range"]) > 1e-9 for r in rows), (
        "expected same-date order ties in testdata"
    )
    for r in rows:
        assert r["running_range"] >= r["running_rows"] - 1e-9
