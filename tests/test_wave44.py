"""Wave 44 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_snapshot_merge_audit(spark):
    rows = sorted(
        registry.QUERIES["io_snapshot_merge"](spark, SF).collect(),
        key=lambda r: r["version"],
    )
    assert [r["op"] for r in rows] == ["create", "append", "merge"]
    m = rows[-1]
    # inserts add to the row count; updates replace in place
    assert m["live_rows"] == rows[1]["live_rows"] + m["n_inserted"]
    assert m["n_updated"] > 0 and m["n_inserted"] == 50
    # stats pruning kept the disjoint first-commit dir untouched
    assert m["dirs_reused"] >= 1


def test_wilson_ci_brackets_rate(spark):
    """ci_lo <= rate <= ci_hi, all within [0, 1], and the interval is
    strictly narrower than 1."""
    rows = registry.QUERIES["stat_wilson_ci"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0
        assert r["ci_hi"] - r["ci_lo"] < 1.0
        assert r["k"] <= r["n"]


def test_threshold_tuning_beats_extremes(spark):
    """The tuned F1 must be at least the F1 of the predict-everything
    cutoff, and the confusion counts must be self-consistent."""
    import duckdb

    r = registry.QUERIES["ml_threshold_tuning"](spark, SF).collect()[0]
    n, p = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END)"
        f" FROM '{SF}/embeddings.parquet'"
    ).fetchone()
    assert r["tp"] + r["fn"] == p
    all_pos_f1 = 2 * p / (n + p)
    assert r["f1"] >= all_pos_f1 - 1e-4
    assert 0 < r["precision"] <= 1 and 0 < r["recall"] <= 1


def test_rolling_corr_bounds(spark):
    rows = registry.QUERIES["w_rolling_corr"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["nw"] >= 7
        if r["roll_corr"] is not None:
            assert -1.0 - 1e-9 <= r["roll_corr"] <= 1.0 + 1e-9
