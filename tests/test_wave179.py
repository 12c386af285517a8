"""Wave 179 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_page_trend_replay(spark):
    """Replay Page's L from collected per-customer midranks."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    o = Catalog(spark, SF)["orders"]
    f = (
        o.groupBy("o_custkey")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.year("o_orderdate") == y, F.col("o_totalprice")
                    ).otherwise(0.0)
                ).alias(f"s{i}")
                for i, y in enumerate((1995, 1996, 1997))
            ]
        )
        .collect()
    )
    n = len(f)
    R = [0.0, 0.0, 0.0]
    for row in f:
        s = [row["s0"], row["s1"], row["s2"]]
        for j in range(3):
            r = 1.0
            for l in range(3):
                if l == j:
                    continue
                if s[l] < s[j]:
                    r += 1.0
                elif s[l] == s[j]:
                    r += 0.5
            R[j] += r
    L = R[0] + 2 * R[1] + 3 * R[2]
    mean = n * 3 * 16 / 4.0
    var = n * 9 * 4 * 8 / 144.0
    z = (L - mean) / var**0.5
    got = registry.QUERIES["stat_page_trend"](spark, SF).collect()[0]
    assert abs(got["page_l"] - L) < 0.01
    assert abs(got["z"] - z) < 0.001
    # mean ranks sum to k(k+1)/2 = 6 per customer
    total = (
        got["mean_rank_1995"] + got["mean_rank_1996"] + got["mean_rank_1997"]
    )
    assert abs(total - 6.0) < 0.001


def test_icc_bounds_and_identity(spark):
    r = registry.QUERIES["stat_icc"](spark, SF).collect()[0]
    msb, msw = r["ms_between_bn"], r["ms_within_bn"]
    assert msb > 0 and msw > 0
    want = (msb - msw) / (msb + 2 * msw)
    assert abs(r["icc_1_1"] - want) < 0.001
    assert -0.5 <= r["icc_1_1"] <= 1.0
