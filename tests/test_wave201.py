"""Wave 201 behavior gates beyond the registry oracle parity.

SAX must name the known word of a square-wave regime series and
read a flat vocabulary on noise; the 4-cycle census must count an
exactly-constructed rectangle pattern and read zero when no two
customers share two parts.
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


def test_sax_names_the_square_wave_regimes(spark, tmp_path):
    from mister_spark.operators.extras201 import ev_sax_symbolic

    # 16-day square wave aligned to the 4-day segments: 8 low days
    # then 8 high days -> segment symbols ..aadd.. and the word
    # vocabulary is exactly the 4 rotations of 'aadd'
    per_day = [(20 if (d // 8) % 2 == 0 else 100) for d in range(96)]
    _write_daily_events(spark, tmp_path, per_day)
    rows = ev_sax_symbolic(spark, str(tmp_path)).collect()
    words = {r["word"] for r in rows}
    assert words == {"aadd", "adda", "ddaa", "daad"}, rows
    # perfectly periodic: all rotations equally frequent
    assert len({r["occurrences"] for r in rows}) <= 2, rows


def test_sax_vocabulary_widens_on_noise(spark, tmp_path):
    from mister_spark.operators.extras201 import ev_sax_symbolic

    _write_daily_events(
        spark,
        tmp_path,
        [
            30 + hashlib.md5(f"sax:{d}".encode()).digest()[0]
            for d in range(96)
        ],
    )
    rows = ev_sax_symbolic(spark, str(tmp_path)).collect()
    # noise: no word dominates
    assert rows[0]["support"] < 0.4, rows


def _write_purchases(spark, tmp_path, cust_parts):
    """cust_parts: list of (custkey, [partkeys]) — one order each."""
    odata = [(ck, ck) for ck, _ in cust_parts]  # orderkey = custkey
    ldata = [
        (ck, pk) for ck, parts in cust_parts for pk in parts
    ]
    spark.createDataFrame(
        odata, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    spark.createDataFrame(
        ldata, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )


def test_graph_squares_counts_rectangles_exactly(spark, tmp_path):
    from mister_spark.operators.extras201 import graph_squares

    # customers 1,2,3 all buy parts {10, 20}: cn(10,20)=3 -> C(3,2)=3
    # squares; customer 4 buys {10, 30} alone -> no extra square
    _write_purchases(
        spark,
        tmp_path,
        [(1, [10, 20]), (2, [10, 20]), (3, [10, 20]), (4, [10, 30])],
    )
    r = graph_squares(spark, str(tmp_path)).collect()[0]
    assert r["n_edges"] == 8 and r["n_wedges"] == 4, r
    assert r["squares"] == 3 and r["square_pairs"] == 1, r

    # star pattern: every customer buys a disjoint pair -> no squares
    _write_purchases(
        spark,
        tmp_path,
        [(c, [100 + 2 * c, 101 + 2 * c]) for c in range(5)],
    )
    r = graph_squares(spark, str(tmp_path)).collect()[0]
    assert r["squares"] == 0 and r["squares_per_wedge"] == 0.0, r
