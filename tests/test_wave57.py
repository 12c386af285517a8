"""Wave 57 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cuped_reduction_nonnegative(spark):
    r = registry.QUERIES["ev_cuped"](spark, SF).collect()[0]
    # theta is the OLS minimizer, so var(Y - thetaX) <= var(Y) always
    assert r["var_reduction"] >= -1e-9
    assert r["n_users"] > 0


def test_ipw_outputs(spark):
    r = registry.QUERIES["ml_ipw_estimate"](spark, SF).collect()[0]
    assert 0 < r["n_logged"] < r["n_users"]
    assert r["naive"] > 0 and r["ipw"] > 0 and r["true_mean"] > 0
    # self-normalized IPW stays inside the observed outcome range
    ys = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
            ).alias("y")
        )
        .agg(F.min("y"), F.max("y"))
        .collect()[0]
    )
    assert ys[0] <= r["ipw"] <= ys[1]


def test_snapshot_upsert_matches_batch(spark):
    got = {
        r["user_id"]: (r["last_ts"], r["last_type"], r["n_events"])
        for r in registry.QUERIES["stream_snapshot_upsert"](spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from mister_spark.catalog import Catalog

    ev = Catalog(spark, SF)["events"]
    want = {
        r["user_id"]: (r["last_ts"], r["last_type"], r["n_events"])
        for r in ev.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type")).alias("m"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("m.event_type").alias("last_type"),
            "n_events",
        )
        .collect()
    }
    assert got == want


def test_hapax_shares_bounded(spark):
    rows = registry.QUERIES["tx_hapax_rate"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 <= r["hapax_type_share"] <= 1.0
        assert r["hapax_token_share"] <= r["hapax_type_share"] + 1e-9
