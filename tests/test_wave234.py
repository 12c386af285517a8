"""Wave 234 behavior gates beyond the registry oracle parity.

The chain ladder must reproduce a hand-built 50/30/20 development
triangle (factors 1.6 / 1.25, ultimates 100); Qini must bow upward
when a planted treatment effect concentrates in high-activity users
and stay near the diagonal under the null.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

FP_MUL = 1000003


def _write_ladder(spark, tmp_path, rows):
    """rows: (orderkey, order 'YYYY-MM-15', ship 'YYYY-MM-20', price)."""
    orders = sorted({(ok, od) for ok, od, _, _ in rows})
    spark.createDataFrame(
        [(ok, f"{od}-15") for ok, od in orders],
        "o_orderkey long, o_orderdate_s string",
    ).select(
        "o_orderkey", F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate")
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    spark.createDataFrame(
        [(ok, f"{sd}-20", pr, 0.0) for ok, _, sd, pr in rows],
        "l_orderkey long, l_shipdate_s string, l_extendedprice double, "
        "l_discount double",
    ).select(
        "l_orderkey", F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
        "l_extendedprice", "l_discount",
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_chain_ladder_matches_hand_triangle(spark, tmp_path):
    from mister_spark.operators.extras234 import fin_chain_ladder

    rows = [
        # Jan origin: 50 ships Jan, 30 Feb, 20 Mar (fully developed)
        (1, "2024-01", "2024-01", 50.0),
        (1, "2024-01", "2024-02", 30.0),
        (1, "2024-01", "2024-03", 20.0),
        # Feb origin: 50 Feb, 30 Mar (age 1 so far)
        (2, "2024-02", "2024-02", 50.0),
        (2, "2024-02", "2024-03", 30.0),
        # Mar origin: 50 Mar (age 0)
        (3, "2024-03", "2024-03", 50.0),
    ]
    _write_ladder(spark, tmp_path, rows)
    out = {r["origin_month"]: r for r in fin_chain_ladder(spark, str(tmp_path)).collect()}
    assert set(out) == {"2024-01", "2024-02", "2024-03"}, out
    # factors: f0 = (80+80)/(50+50) = 1.6, f1 = 100/80 = 1.25
    mar = out["2024-03"]
    assert mar["dev_age_months"] == 0 and mar["shipped_to_date"] == 50.0
    assert abs(mar["ultimate"] - 100.0) < 0.01, mar
    assert abs(mar["completion"] - 0.5) < 0.001, mar
    feb = out["2024-02"]
    assert abs(feb["ultimate"] - 100.0) < 0.01, feb
    assert abs(feb["completion"] - 0.8) < 0.001, feb
    jan = out["2024-01"]
    assert abs(jan["completion"] - 1.0) < 0.001, jan


def _write_uplift_events(spark, tmp_path, effect, mixed=True):
    """Users 1..200: odd ids low activity (10 events), even ids high
    (100) when `mixed`; all high otherwise (uniform propensity, so a
    zero effect makes Qini identically zero). Purchase value gets
    +`effect` per event for TREATED high-activity users (treatment =
    the op's hash policy)."""
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    for uid in range(1, 201):
        high = (uid % 2 == 0) or not mixed
        n_ev = 100 if high else 10
        p = 70 if n_ev >= 70 else 30
        treated = (uid * FP_MUL) % 100 < p
        for k in range(n_ev):
            ts = (d0 + datetime.timedelta(minutes=k)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            val = 10.0
            if treated and high:
                val += effect
            rows.append((eid, ts, uid, "purchase", val))
            eid += 1
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string, "
            "value double",
        )
        .select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_qini_bows_with_planted_effect(spark, tmp_path):
    from mister_spark.operators.extras234 import ml_qini_auuc

    _write_uplift_events(spark, tmp_path, effect=5.0)
    out = sorted(
        ml_qini_auuc(spark, str(tmp_path)).collect(), key=lambda r: r["rank"]
    )
    # top-ranked bucket carries the planted positive uplift
    assert out[0]["uplift_score"] > 100, out[0]
    assert out[0]["auuc"] > 0, out[0]
    # qini at the end equals overall treated-minus-scaled-control
    assert out[-1]["cum_population_frac"] == 1.0, out[-1]

    # null with uniform propensity and constant outcome: Qini is
    # IDENTICALLY zero (the confounded mixed-propensity case is a
    # known Qini artifact, not a model signal)
    _write_uplift_events(spark, tmp_path, effect=0.0, mixed=False)
    out0 = ml_qini_auuc(spark, str(tmp_path)).collect()
    assert abs(out0[0]["auuc"]) < 1e-6, out0[0]
