"""Wave 206 behavior gates beyond the registry oracle parity.

The XML round-trip must preserve exact counts/totals including
special characters in string fields; BDS must accept iid noise and
reject a deterministic nonlinear (tent-map-like) series that passes
a pure autocorrelation look.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def test_xml_roundtrip_preserves_values_and_escapes(spark, tmp_path):
    from mister_spark.operators.extras206 import io_xml_query

    rows = [
        (1, 10, "O", 100.25, "1-URGENT"),
        (2, 11, "F", 200.75, "2-HIGH"),
        (3, 12, "O", 0.01, "5<&>LOW"),  # XML-escaped characters
        (4, 13, "P", 9999999.99, "2-HIGH"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderpriority string",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    got = {
        r["o_orderpriority"]: r
        for r in io_xml_query(spark, str(tmp_path)).collect()
    }
    assert got["2-HIGH"]["n"] == 2 and got["2-HIGH"]["total"] == 10000200.74
    assert got["5<&>LOW"]["n"] == 1 and got["5<&>LOW"]["total"] == 0.01


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


def test_bds_accepts_iid_and_rejects_tent_map(spark, tmp_path):
    from mister_spark.operators.extras206 import stat_bds

    # hash noise: iid, |z| small
    _write_daily_events(
        spark,
        tmp_path,
        [
            30 + hashlib.md5(f"bds2:{d}".encode()).digest()[0]
            for d in range(120)
        ],
    )
    r = stat_bds(spark, str(tmp_path)).collect()[0]
    assert r["iid_rejected"] == 0, r
    assert abs(r["bds_z"]) < 1.96, r

    # tent map: deterministic chaos — near-zero lag-1 autocorrelation
    # yet fully dependent; BDS must fire
    x, series = 0.37, []
    for _ in range(120):
        x = 2 * x if x < 0.5 else 2 * (1 - x)
        x = min(max(x, 1e-9), 1 - 1e-9)
        series.append(20 + int(200 * x))
    _write_daily_events(spark, tmp_path, series)
    r = stat_bds(spark, str(tmp_path)).collect()[0]
    assert r["iid_rejected"] == 1, r
    assert abs(r["bds_z"]) > 1.96, r


def test_bds_degenerate_constant_series_reads_zero(spark, tmp_path):
    from mister_spark.operators.extras206 import stat_bds

    _write_daily_events(spark, tmp_path, [50] * 40)
    r = stat_bds(spark, str(tmp_path)).collect()[0]
    # all pairs match: c1 = c2 = k = 1, variance guard -> z = 0
    assert r["c1"] == 1.0 and r["c2"] == 1.0, r
    assert r["bds_z"] == 0.0 and r["iid_rejected"] == 0, r
