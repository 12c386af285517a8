"""Wave 21 gates: the Holt recursion must chain (python re-derivation),
Q-Q monotonicity, seasonal-anomaly invariants."""

from __future__ import annotations

import math

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _r4(x: float) -> float:
    return math.floor(x * 10_000 + 0.5) / 10_000


def test_holt_recursion_chains(spark):
    import duckdb

    daily = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   FLOOR(SUM(value) * 100 + 0.5) / 100 AS x
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[tuple[int, float]]] = {}
    for et, day, x in daily:
        series.setdefault(et, []).append((day, x))

    ref = {}
    for et, pts in series.items():
        pts.sort()
        lvl, trend = pts[0][1], 0.0
        ref[(et, pts[0][0])] = (_r4(lvl), _r4(trend))
        prev_day = pts[0][0]
        for day, x in pts[1:]:
            if day != prev_day + 1:
                prev_day = day  # recursion only advances on consecutive days
                continue
            new_lvl = _r6(0.5 * x + 0.5 * (lvl + trend))
            trend = _r6(0.25 * (new_lvl - lvl) + 0.75 * trend)
            lvl = new_lvl
            ref[(et, day)] = (_r4(lvl), _r4(trend))
            prev_day = day

    got = {
        (r.event_type, r.day): (r.level, r.trend)
        for r in registry.QUERIES["ev_holt_smoothing"](spark, SF).collect()
    }
    assert got == ref, (
        len(got),
        len(ref),
        sorted(set(got) ^ set(ref))[:5],
    )


def test_qq_monotone(spark):
    rows = sorted(registry.QUERIES["stat_qq"](spark, SF).collect(), key=lambda r: r.i)
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        assert a.q_purchase <= b.q_purchase + 1e-9
        assert a.q_error <= b.q_error + 1e-9


def test_seasonal_anomaly_invariants(spark):
    rows = registry.QUERIES["ev_anomaly_seasonal"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_seasonal_outliers <= r.n
