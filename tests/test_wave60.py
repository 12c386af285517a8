"""Wave 60 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_circular_hour_bounds(spark):
    rows = registry.QUERIES["stat_circular_hour"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["mean_hour"] < 24.0
        assert 0.0 <= r["resultant"] <= 1.0
        assert r["circ_std"] >= 0.0


def test_littles_law_identity(spark):
    r = registry.QUERIES["ev_littles_law"](spark, SF).collect()[0]
    assert r["n_sessions"] > 0
    # the whole point: L == lambda * W up to rounding
    assert abs(r["identity_ratio"] - 1.0) < 0.001
    assert abs(r["l_avg"] - r["l_littles"]) < 0.01 * max(r["l_avg"], 1)


def test_mattr_bounds_and_boilerplate_sensitivity(spark):
    rows = registry.QUERIES["tx_mattr"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["mattr_min"] <= r["mattr"] <= 1.0
    # constructed check: a looping doc scores lower than a varied doc
    probe = spark.createDataFrame(
        [
            (0, "a b c d e " * 30, "x", "loop", 100),
            (1, " ".join(f"w{i}" for i in range(150)), "x", "varied", 100),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        probe.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["source"]: r["mattr"]
            for r in registry.QUERIES["tx_mattr"](spark, d).collect()
        }
    assert got["loop"] < 0.3 < got["varied"]


def test_parquet_footer_audit_accounting(spark):
    rows = registry.QUERIES["io_parquet_footer_audit"](spark, SF).collect()
    cols = {r["column"] for r in rows}
    # every lineitem column audited
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert set(li.columns) <= cols
    for r in rows:
        assert r["row_groups"] >= 1
        assert r["compressed_bytes"] > 0 and r["raw_bytes"] > 0
        assert 0.0 <= r["stats_coverage"] <= 1.0
        assert r["codec"] != ""
