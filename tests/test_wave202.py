"""Wave 202 behavior gates beyond the registry oracle parity.

The DP accountant must show the sqrt(k) advantage of zCDP over basic
composition growing with the release count; Sharpe/Sortino must
separate a steady-growth stream from a crash-prone one with the same
mean return, with Sortino moving further than Sharpe.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_typed_events(spark, tmp_path, day_types):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, types in enumerate(day_types):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for etype in types:
            rows.append((eid, ts, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_dp_accountant_shows_zcdp_advantage_growing(spark, tmp_path):
    from mister_spark.operators.extras202 import ds_dp_accountant

    # 10 releases (10 days x 1 type)
    _write_typed_events(spark, tmp_path, [["click"]] * 10)
    small = ds_dp_accountant(spark, str(tmp_path)).collect()[0]
    assert small["n_releases"] == 10, small

    # 400 releases (100 days x 4 types)
    _write_typed_events(
        spark, tmp_path, [["click", "view", "error", "signup"]] * 100
    )
    big = ds_dp_accountant(spark, str(tmp_path)).collect()[0]
    assert big["n_releases"] == 400, big
    # composition ordering: zCDP <= advanced <= basic at scale
    assert big["eps_zcdp"] < big["eps_advanced"] < big["eps_basic"], big
    # the naive-vs-zCDP gap grows ~sqrt(k)
    assert big["basic_over_zcdp"] > 2 * small["basic_over_zcdp"], (
        small,
        big,
    )


def _write_orders(spark, tmp_path, daily_revenue):
    rows, ok = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, rev in enumerate(daily_revenue):
        rows.append((ok, str(d0 + datetime.timedelta(days=day)), float(rev)))
        ok += 1
    (
        spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate_s string, o_totalprice double"
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "orders.parquet"))
    )


def test_sortino_premium_shrinks_when_risk_is_downside(spark, tmp_path):
    from mister_spark.operators.extras202 import fin_sharpe_ratios

    # steady 1%/day growth: no down days, huge Sharpe, Sortino falls
    # back to 0 (no downside deviation to divide by)
    steady = [1000.0 * (1.01**d) for d in range(60)]
    _write_orders(spark, tmp_path, steady)
    r = fin_sharpe_ratios(spark, str(tmp_path)).collect()[0]
    assert r["down_days"] == 0 and r["sortino_annual"] == 0.0, r
    assert r["sharpe_annual"] > 10, r
    steady_sharpe = r["sharpe_annual"]

    # symmetric jitter: half the variance is upside, so Sortino's
    # downside-only denominator is ~vol/sqrt(2) and the
    # Sortino/Sharpe premium sits near sqrt(2)
    sym = []
    lvl = 1000.0
    for d in range(60):
        lvl *= 1.033 if d % 2 else 0.97
        sym.append(lvl)
    _write_orders(spark, tmp_path, sym)
    s = fin_sharpe_ratios(spark, str(tmp_path)).collect()[0]
    assert 28 <= s["down_days"] <= 30, s
    sym_premium = s["sortino_annual"] / s["sharpe_annual"]
    assert 1.2 < sym_premium < 1.7, s

    # crash-prone with the same mean drift: the variance is
    # concentrated in rare big losses, so the downside denominator
    # keeps more of the full vol and the premium shrinks
    crashy = []
    lvl = 1000.0
    for d in range(60):
        lvl *= 0.88 if d % 10 == 9 else 1.0253
        crashy.append(lvl)
    _write_orders(spark, tmp_path, crashy)
    r = fin_sharpe_ratios(spark, str(tmp_path)).collect()[0]
    assert r["down_days"] == 6, r
    assert 0 < r["sharpe_annual"] < steady_sharpe, (steady_sharpe, r)
    crash_premium = r["sortino_annual"] / r["sharpe_annual"]
    assert crash_premium < sym_premium - 0.15, (s, r)
