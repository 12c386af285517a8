"""Wave 191 behavior gates beyond the registry oracle parity.

The ADF test must NOT reject on a planted random walk and must
strongly reject on a planted mean-reverting series; Engle-Granger
must flag a planted common-trend pair as cointegrated and must not
flag two independent random walks.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: list of (day_index, event_type, count)."""
    flat = []
    eid = 0
    d0 = datetime.date(2024, 1, 1)
    for day, etype, n in rows:
        ts = f"{d0 + datetime.timedelta(days=day)} 12:00:00"
        for _ in range(n):
            flat.append((eid, ts, etype))
            eid += 1
    (
        spark.createDataFrame(flat, "event_id long, ts_s string, et string")
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
            F.col("et").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def _walk(n, seed, base=300, step=7):
    """Deterministic iid-coin-flip walk of daily counts (md5 parity —
    modular-arithmetic parities alternate, which mean-reverts)."""
    import hashlib

    y, out = base, []
    for t in range(n):
        h = hashlib.md5(f"{seed}:{t}".encode()).digest()[0]
        y += step if h % 2 == 0 else -step
        out.append(max(y, 10))
    return out


def test_adf_separates_walk_from_mean_reversion(spark, tmp_path):
    from mister_spark.operators.extras191 import stat_adf

    # planted random walk: level coefficient ~0, tau inside the
    # acceptance region -> unit root NOT rejected
    walk = _walk(80, seed=4)
    _write_events(spark, tmp_path, [(d, "click", n) for d, n in enumerate(walk)])
    rw = stat_adf(spark, str(tmp_path)).collect()[0]
    assert rw["n_obs"] == 78, rw
    assert rw["unit_root_rejected"] == 0, rw

    # planted strong mean reversion (alternating around a level, with
    # a small aperiodic wobble — PERFECT alternation is exactly
    # collinear with the lagged-difference regressor, RSS = 0, and the
    # guarded statistic would return 0): rho hugely negative, tau far
    # below -2.86
    import hashlib

    mr = [
        200
        + (40 if d % 2 else -40)
        + hashlib.md5(f"n:{d}".encode()).digest()[0] % 7
        for d in range(80)
    ]
    _write_events(spark, tmp_path, [(d, "click", n) for d, n in enumerate(mr)])
    st = stat_adf(spark, str(tmp_path)).collect()[0]
    assert st["unit_root_rejected"] == 1, st
    assert st["adf_t"] < -5, st
    assert st["rho"] < -0.5, st


def test_cointegration_flags_common_trend_only(spark, tmp_path):
    from mister_spark.operators.extras191 import stat_cointegration

    # common trend: views = clicks + small alternating stationary
    # spread -> the spread is stationary, EG rejects hard
    clicks = _walk(80, seed=3)
    rows = []
    for d, c in enumerate(clicks):
        rows.append((d, "click", c))
        rows.append((d, "view", c + (5 if d % 2 else -5)))
    _write_events(spark, tmp_path, rows)
    co = stat_cointegration(spark, str(tmp_path)).collect()[0]
    assert co["n_days"] == 80, co
    assert co["cointegrated"] == 1, co
    assert 0.8 < co["beta"] < 1.2, co

    # independent walks: the residual is itself a walk -> no rejection
    a, b = _walk(150, seed=5), _walk(150, seed=11)
    rows = []
    for d in range(150):
        rows.append((d, "click", a[d]))
        rows.append((d, "view", b[d]))
    _write_events(spark, tmp_path, rows)
    ind = stat_cointegration(spark, str(tmp_path)).collect()[0]
    assert ind["cointegrated"] == 0, ind
