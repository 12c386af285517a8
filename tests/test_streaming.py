"""Streaming jobs must equal their batch twins on a bounded replay."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    batch = registry.QUERIES["ev_tumbling"](spark, SF)
    stream = registry.QUERIES["stream_tumbling"](spark, SF)
    b = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    s = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in stream.collect()
    }
    assert b == s


def test_stream_dedup_matches_batch(spark):
    stream = registry.QUERIES["stream_dedup"](spark, SF)
    from mister_spark.catalog import Catalog

    n_distinct = (
        Catalog(spark, SF)["events"].select("event_id").distinct().count()
    )
    assert stream.count() == n_distinct


def test_stream_sessionize_matches_batch(spark):
    batch = registry.QUERIES["ev_sessionize"](spark, SF)
    stream = registry.QUERIES["stream_session_state"](spark, SF)
    b = {
        (r["user_id"], r["sess_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in batch.collect()
    }
    s = {
        (r["user_id"], r["sess_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in stream.collect()
    }
    assert b == s


def test_stream_foreach_batch_sink(spark):
    import os

    from mister_spark.streaming.jobs import REPO_TMP, run_stream_foreach_batch

    out = os.path.join(REPO_TMP, "fb_out")
    n_batches = run_stream_foreach_batch(spark, SF, out)
    assert n_batches >= 1
    written = spark.read.parquet(out)
    from mister_spark.catalog import Catalog

    assert written.count() == Catalog(spark, SF)["events"].count()
