"""Wave 180 behavior gates: streaming CDC merge batch parity."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_stream_cdc_merge_matches_batch_latest(spark):
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    got = registry.QUERIES["stream_cdc_merge"](spark, SF)
    rows = got.collect()
    # >1 snapshot version actually committed (a real multi-batch replay)
    assert rows[0]["table_versions"] >= 2
    # ground truth: batch latest-per-user by (ts, event_id)
    ev = Catalog(spark, SF)["events"].select(
        "user_id",
        F.unix_micros("ts").alias("ts"),
        "event_id",
        "event_type",
        "value",
    )
    want = {
        r["user_id"]: (
            r["s"]["ts"],
            r["s"]["event_id"],
            r["s"]["event_type"],
            r["s"]["value"],
        )
        for r in ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "event_id", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("s")
        )
        .collect()
    }
    assert len(rows) == len(want)
    for r in rows:
        w = want[r["user_id"]]
        assert (
            r["last_ts"],
            r["last_event_id"],
            r["last_event_type"],
            r["last_value"],
        ) == w, (r, w)
