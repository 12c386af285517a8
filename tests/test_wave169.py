"""Wave 169 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_hodges_lehmann_is_between_min_and_max(spark):
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    rows = registry.QUERIES["stat_hodges_lehmann"](spark, SF).collect()
    assert len(rows) == 3  # A, N, R
    li = Catalog(spark, SF)["lineitem"]
    bounds = {
        r["l_returnflag"]: (r["mn"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("mn"), F.max("l_quantity").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = bounds[r["flag"]]
        assert mn <= r["hl_estimate"] <= mx, r
        # i<=j pairs over n values: n(n+1)/2 weighted pairs
        assert r["walsh_pairs"] > 0


def test_hodges_lehmann_matches_numpy_bruteforce(spark):
    """Exact replay on one flag: median of all pairwise Walsh averages
    (i<=j) computed brute-force on the raw values."""
    import numpy as np

    from mister_spark.catalog import Catalog

    li = Catalog(spark, SF)["lineitem"]
    vals = np.array(
        [
            float(r["l_quantity"])
            for r in li.filter("l_returnflag = 'A'")
            .select("l_quantity")
            .collect()
        ]
    )
    walsh = (vals[:, None] + vals[None, :]) / 2.0
    iu = np.triu_indices(len(vals))
    w = np.sort(walsh[iu])
    # first value whose cumulative count reaches half (weighted-median
    # convention used by the operator; equals lower median here)
    half = (len(w) + 1) // 2
    expect = w[half - 1]
    got = {
        r["flag"]: r["hl_estimate"]
        for r in registry.QUERIES["stat_hodges_lehmann"](spark, SF).collect()
    }
    assert abs(got["A"] - expect) < 0.01, (got["A"], expect)


def test_iceberg_roundtrip_audit(spark):
    r = registry.QUERIES["io_iceberg_roundtrip"](spark, SF).collect()[0]
    assert r["versions"] == 3
    assert r["all_versions_match"] == 1
    assert r["rows_current"] > 0
    # one manifest per distinct data dir, one manifest list per version
    assert r["manifest_lists"] == 3
    assert r["manifest_files"] >= 3
