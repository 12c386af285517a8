"""Wave 49 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cusum_nonneg_and_alarms(spark):
    rows = registry.QUERIES["ev_cusum_detect"](spark, SF).collect()
    assert len(rows) == 30  # full day grid, not just alarms
    assert any(r["alarm"] for r in rows)  # detector actually fires
    for r in rows:
        assert r["cusum_up"] >= 0.0 and r["cusum_down"] >= 0.0
        if r["alarm"]:
            assert r["cusum_up"] > 1.5 or r["cusum_down"] > 1.5


def test_cusum_matches_textbook_recursion(spark):
    """The prefix-sum-minus-running-min identity must equal the
    textbook max(0, S + z - k) recursion replayed on the daily series."""
    import duckdb

    daily = duckdb.sql(
        f"""SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    mu = sum(ys) / n
    sd = (sum((y - mu) ** 2 for y in ys) / (n - 1)) ** 0.5
    su = sdn = 0.0
    want = []
    for y in ys:
        z = (y - mu) / sd
        su = max(0.0, su + z - 0.5)
        sdn = max(0.0, sdn + (-z) - 0.5)
        want.append((su, sdn))
    got = sorted(
        registry.QUERIES["ev_cusum_detect"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    for (wu, wd), r in zip(want, got):
        assert abs(r["cusum_up"] - wu) < 1e-3
        assert abs(r["cusum_down"] - wd) < 1e-3


def test_did_identity(spark):
    r = registry.QUERIES["ev_did"](spark, SF).collect()[0]
    did = (r["treated_post"] - r["treated_pre"]) - (
        r["control_post"] - r["control_pre"]
    )
    assert abs(r["did"] - did) < 1e-3
    assert r["n_events"] > 0


def test_acceleration_integer_identity(spark):
    rows = registry.QUERIES["ev_acceleration"](spark, SF).collect()
    assert len(rows) == 15
    accs = [abs(r["acceleration"]) for r in rows]
    assert accs == sorted(accs, reverse=True)


def test_pacf_lag1_equals_acf1(spark):
    rows = sorted(
        registry.QUERIES["stat_pacf"](spark, SF).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(1, 8))
    assert rows[0]["pacf"] == rows[0]["acf"]  # identity at lag 1
    for r in rows:
        assert -1.0 - 1e-9 <= r["pacf"] <= 1.0 + 1e-9
