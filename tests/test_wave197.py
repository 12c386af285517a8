"""Wave 197 behavior gates beyond the registry oracle parity.

KPSS must read 0 on a constant series, stay under the 5% critical
value on white noise, and blow past it on a random walk; Somers' D
must read +1/-1 on perfect monotone/antitone prediction and show the
d_yx vs d_xy asymmetry when only the response carries ties.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _write_daily_events(spark, tmp_path, per_day):
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day, n in enumerate(per_day):
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    (
        spark.createDataFrame(rows, "event_id long, ts_s string")
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def _noise(i, span=40):
    return hashlib.md5(f"kpss:{i}".encode()).digest()[0] % span


def test_kpss_reads_stationarity(spark, tmp_path):
    from mister_spark.operators.extras197 import stat_kpss

    # constant series: residuals are all zero -> stat exactly 0
    _write_daily_events(spark, tmp_path, [50] * 40)
    r = stat_kpss(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 40 and r["kpss_stat"] == 0.0, r
    assert r["stationarity_rejected"] == 0, r

    # white noise around a level: bridge stays small, not rejected
    _write_daily_events(
        spark, tmp_path, [60 + _noise(d) for d in range(80)]
    )
    r = stat_kpss(spark, str(tmp_path)).collect()[0]
    assert r["stationarity_rejected"] == 0, r
    noise_stat = r["kpss_stat"]

    # random walk (cumsum of noise steps): bridge wanders, rejected
    walk, level = [], 200
    for d in range(80):
        level += _noise(d, 21) - 10
        walk.append(max(level, 1))
    _write_daily_events(spark, tmp_path, walk)
    r = stat_kpss(spark, str(tmp_path)).collect()[0]
    assert r["kpss_stat"] > max(0.463, noise_stat), r
    assert r["stationarity_rejected"] == 1, r


def test_kpss_bartlett_lag_follows_schwert_rule(spark, tmp_path):
    from mister_spark.operators.extras197 import stat_kpss

    # n=30 -> floor(4*(30/100)^0.25) = 2; n=100 -> 4
    _write_daily_events(spark, tmp_path, [10] * 30)
    assert stat_kpss(spark, str(tmp_path)).collect()[0]["bartlett_lags"] == 2
    _write_daily_events(spark, tmp_path, [10] * 100)
    assert stat_kpss(spark, str(tmp_path)).collect()[0]["bartlett_lags"] == 4


def _write_orders_lineitem(spark, tmp_path, orders):
    """orders: list of (orderkey, n_lineitems, priority_digit)."""
    odata = [
        (ok, f"{pr}-PRIORITY") for ok, _, pr in orders
    ]
    ldata = [
        (ok, i) for ok, nli, _ in orders for i in range(nli)
    ]
    spark.createDataFrame(
        odata, "o_orderkey long, o_orderpriority string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    spark.createDataFrame(
        ldata, "l_orderkey long, l_linenumber int"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_somers_d_reads_monotone_prediction(spark, tmp_path):
    from mister_spark.operators.extras197 import stat_somers_d

    # basket size 1,2,3 -> priority 1,2,3: perfect concordance
    _write_orders_lineitem(
        spark,
        tmp_path,
        [(ok, sz, sz) for ok, sz in enumerate([1, 1, 2, 2, 3, 3])],
    )
    r = stat_somers_d(spark, str(tmp_path)).collect()[0]
    assert r["discordant"] == 0 and r["d_yx"] == 1.0, r

    # reversed mapping: perfect discordance
    _write_orders_lineitem(
        spark,
        tmp_path,
        [(ok, sz, 4 - sz) for ok, sz in enumerate([1, 1, 2, 2, 3, 3])],
    )
    r = stat_somers_d(spark, str(tmp_path)).collect()[0]
    assert r["concordant"] == 0 and r["d_yx"] == -1.0, r


def test_somers_d_is_asymmetric_under_response_ties(spark, tmp_path):
    from mister_spark.operators.extras197 import stat_somers_d

    # x in {1,2,3,4} but y collapses 1,2->1 and 3,4->2: pairs tied on
    # y but split on x penalize D(y|x) only; D(x|y) ignores them.
    _write_orders_lineitem(
        spark,
        tmp_path,
        [(ok, sz, 1 + (sz - 1) // 2) for ok, sz in enumerate([1, 2, 3, 4])],
    )
    r = stat_somers_d(spark, str(tmp_path)).collect()[0]
    assert r["tied_y_pairs"] == 2 and r["tied_x_pairs"] == 0, r
    assert r["d_xy"] == 1.0, r
    assert abs(r["d_yx"] - 4.0 / 6.0) < 1e-6, r
    assert r["d_yx"] < r["d_xy"], r
