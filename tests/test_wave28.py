"""Wave 28 behavior gates (oracle parity is in test_oracle_parity):
interpolation endpoints, quantization error bound, weighted-median
position, and shard-manifest byte accounting."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_linear_interp_endpoints_observed(spark):
    """Every interpolated row must be bracketed: within each event
    type, the first and last emitted rows are observed, and
    interpolated values lie between their bracketing observations'
    min/max (linearity ⇒ monotone between endpoints)."""
    rows = registry.QUERIES["ev_linear_interp"](spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for _, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        assert rs[0]["observed"] == 1 and rs[-1]["observed"] == 1
        # dense day coverage between first and last emitted day
        assert {r["day"] for r in rs} == set(range(rs[0]["day"], rs[-1]["day"] + 1))
        obs = [r for r in rs if r["observed"] == 1]
        lo = min(r["value"] for r in obs)
        hi = max(r["value"] for r in obs)
        for r in rs:
            if r["observed"] == 0:
                assert lo - 1e-9 <= r["value"] <= hi + 1e-9


def test_quantize_error_bound(spark):
    """Rounding to the nearest int8 level can miss by at most half a
    step: max_err ≤ scale/2 (plus the 1e-6 reporting grid)."""
    rows = registry.QUERIES["emb_quantize_int8"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_err"] <= r["scale"] / 2 + 1e-6, r
        assert r["n_dims"] == 64


def test_weighted_median_is_weighted_center(spark):
    """For each nation, at least half the order-weight lies at or
    below the reported weighted median (recomputed independently)."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    c = Catalog(spark, SF)
    w = c["orders"].groupBy("o_custkey").agg(F.count(F.lit(1)).alias("wt"))
    j = (
        c["customer"]
        .join(w, F.col("c_custkey") == F.col("o_custkey"))
        .join(c["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("c_acctbal").alias("v"), "wt")
    )
    data = j.collect()
    med = {
        r["nation"]: (r["wmedian"], r["total_weight"])
        for r in registry.QUERIES["stat_weighted_median"](spark, SF).collect()
    }
    assert med
    for nation, (m, tot) in med.items():
        rs = [r for r in data if r["nation"] == nation]
        assert sum(r["wt"] for r in rs) == tot
        below = sum(r["wt"] for r in rs if r["v"] <= m + 1e-9)
        assert 2 * below >= tot, (nation, below, tot)


def test_shard_manifest_accounting(spark):
    """Offsets are the exact prefix sum in doc_id order and every
    shard's span stays within one cap of its start boundary."""
    from mister_spark.operators.extras28 import SHARD_CAP_BYTES

    rows = registry.QUERIES["mm_shard_manifest"](spark, SF).collect()
    rows.sort(key=lambda r: r["doc_id"])
    run = 0
    for r in rows:
        assert r["byte_offset"] == run
        assert r["shard"] == r["byte_offset"] // SHARD_CAP_BYTES
        run += r["nbytes"]
    assert rows[-1]["shard"] >= 1  # corpus actually spans multiple shards
