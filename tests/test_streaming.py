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


def test_stream_session_state_event_time_eviction(spark, tmp_path):
    """EventTimeTimeout eviction contract (round-4 verdict item 8): an
    idle user's open session is evicted when the watermark passes their
    last event + gap, emitted EXACTLY ONCE and flagged
    closed_by_timeout; gap-closed sessions emit immediately without
    the flag. Three single-file micro-batches drive the watermark."""
    import datetime as dt
    import os

    from mister_spark.streaming.jobs import run_stream_sessionize_evicting

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        p = str(tmp_path / "staging" / name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        part = next(
            f for f in os.listdir(p) if f.endswith(".parquet")
        )
        dest = str(tmp_path / "in" / f"{name}.parquet")
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        os.rename(os.path.join(p, part), dest)
        os.utime(dest, (mtime, mtime))

    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    # batch 1: user 1 (3 events, will go idle), user 2 (1 event)
    write_file(
        "f1",
        [(1, mins(0)), (1, mins(2)), (1, mins(5)), (2, mins(0))],
        1_700_000_000,
    )
    # batch 2: user 2 returns after a 3 h gap -> closes their session 1
    # by gap and advances the watermark past user 1's timeout
    write_file("f2", [(2, mins(180))], 1_700_000_010)
    # batch 3: a later dummy event so the timeout fires in a batch that
    # actually runs (timeouts are evaluated against the watermark set
    # at the END of the previous batch)
    write_file("f3", [(3, mins(240))], 1_700_000_020)

    out = run_stream_sessionize_evicting(
        spark, str(tmp_path / "in"), watermark="10 minutes"
    ).collect()
    rows = {
        (r["user_id"], r["sess_id"]): r for r in out
    }
    assert len(out) == len(rows) == 3, out  # each session exactly once
    # user 1: idle -> evicted by EventTimeTimeout, full session intact
    r1 = rows[(1, 1)]
    assert r1["closed_by_timeout"] == 1
    assert r1["n_events"] == 3
    assert r1["start_us"] == int(t0.timestamp() * 1e6)
    assert r1["end_us"] == int(mins(5).timestamp() * 1e6)
    # user 2 session 1: closed by an in-stream gap, not by timeout
    r2 = rows[(2, 1)]
    assert r2["closed_by_timeout"] == 0
    assert r2["n_events"] == 1
    # user 2 session 2: evicted in availableNow's final timer batch
    # (final watermark 03:50 passes its 03:30 timeout)
    assert rows[(2, 2)]["closed_by_timeout"] == 1
    # user 3's session (timeout 04:30) outlives the final watermark ->
    # still open in state, not emitted
    assert (3, 1) not in rows


def test_stream_session_late_in_gap_event_cannot_shrink_session(spark, tmp_path):
    """A late-but-within-watermark event that lands INSIDE an open
    session's gap in a later micro-batch must merge without regressing
    the session bounds: end_us stays the max event time seen, start_us
    the min, and the eviction timeout is keyed off the max (an
    out-of-order arrival must not shorten it)."""
    import datetime as dt
    import os

    from mister_spark.streaming.jobs import run_stream_sessionize_evicting

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        p = str(tmp_path / "staging" / name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        part = next(f for f in os.listdir(p) if f.endswith(".parquet"))
        dest = str(tmp_path / "in" / f"{name}.parquet")
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        os.rename(os.path.join(p, part), dest)
        os.utime(dest, (mtime, mtime))

    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    # batch 1: user 1 at 00:00 and 00:05 -> open session, last=00:05
    write_file("f1", [(1, mins(0)), (1, mins(5))], 1_700_000_000)
    # batch 2: late in-gap event at 00:03 (watermark after batch 1 is
    # 00:05 - 10 min < 00:03, so it is NOT dropped) — must merge
    # without moving end_us back to 00:03 or shortening the timeout
    write_file("f2", [(1, mins(3))], 1_700_000_010)
    # batch 3: far-future dummy to push the watermark past user 1's
    # 00:05 + 30 min gap and evict the session
    write_file("f3", [(9, mins(240))], 1_700_000_020)

    out = run_stream_sessionize_evicting(
        spark, str(tmp_path / "in"), watermark="10 minutes"
    ).collect()
    rows = {(r["user_id"], r["sess_id"]): r for r in out}
    r1 = rows[(1, 1)]
    assert r1["closed_by_timeout"] == 1
    assert r1["n_events"] == 3
    assert r1["start_us"] == int(t0.timestamp() * 1e6)
    # the regression under test: end_us must be 00:05, not the late 00:03
    assert r1["end_us"] == int(mins(5).timestamp() * 1e6)


def test_stream_foreach_batch_sink(spark):
    import os

    from mister_spark.streaming.jobs import REPO_TMP, run_stream_foreach_batch

    out = os.path.join(REPO_TMP, "fb_out")
    n_batches = run_stream_foreach_batch(spark, SF, out)
    assert n_batches >= 1
    written = spark.read.parquet(out)
    from mister_spark.catalog import Catalog

    assert written.count() == Catalog(spark, SF)["events"].count()


def test_stream_sliding_matches_batch(spark):
    batch = registry.QUERIES["ev_sliding"](spark, SF)
    stream = registry.QUERIES["stream_sliding"](spark, SF)
    b = {
        (r["wstart_us"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    s = {
        (r["wstart_us"], r["event_type"]): (r["n"], r["total"])
        for r in stream.collect()
    }
    assert b == s


def test_stream_sliding_update_matches_batch(spark):
    """Update-mode sliding job (foreachBatch upsert-by-key sink): the
    last emission per window must equal the batch aggregate exactly on
    a bounded replay — the long-running config's parity gate."""
    batch = registry.QUERIES["ev_sliding"](spark, SF)
    stream = registry.QUERIES["stream_sliding_update"](spark, SF)
    b = {
        (r["wstart_us"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    s = {
        (r["wstart_us"], r["event_type"]): (r["n"], r["total"])
        for r in stream.collect()
    }
    assert b == s


def test_stream_enrich_matches_batch(spark):
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    c = Catalog(spark, SF)
    batch = (
        c["events"]
        .join(
            c["customer"].select("c_custkey", "c_mktsegment"),
            F.col("user_id") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("total"),
        )
    )
    stream = registry.QUERIES["stream_enrich"](spark, SF)
    b = {r["c_mktsegment"]: (r["n"], r["total"]) for r in batch.collect()}
    s = {r["c_mktsegment"]: (r["n"], r["total"]) for r in stream.collect()}
    assert b == s


def test_kafka_surface(spark):
    import pytest as _pytest

    from mister_spark.streaming import kafka_source_options, read_kafka_stream

    opts = kafka_source_options("broker:9092", "events")
    assert opts["subscribe"] == "events"
    assert opts["failOnDataLoss"] == "true"
    assert int(opts["maxOffsetsPerTrigger"]) > 0
    # no connector jar in this container: the reader must fail loudly
    # with submit guidance, not silently degrade
    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "broker:9092", "events")


def test_stream_stream_join_matches_batch(spark):
    # sf0.001 has zero qualifying pairs (sparse stream); use sf0.01 so
    # the parity assert is non-vacuous.
    sf = "/root/testdata/sf0.01"
    batch = registry.QUERIES["ev_range_join"](spark, sf)
    stream = registry.QUERIES["stream_stream_join"](spark, sf)
    b = {(r["purchase_id"], r["error_id"]) for r in batch.collect()}
    s = {(r["purchase_id"], r["error_id"]) for r in stream.collect()}
    assert len(b) > 0
    assert b == s


def test_stream_stream_left_join_matches_batch(spark):
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    stream = registry.QUERIES["stream_stream_left_join"](spark, sf)
    s = {(r["purchase_id"], r["error_id"]) for r in stream.collect()}
    # batch twin: every purchase exactly once unless matched
    from mister_spark.catalog import Catalog

    ev = Catalog(spark, sf)["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pt"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("eu"),
        F.col("ts").alias("et"),
    )
    b = p.join(
        e,
        (F.col("pu") == F.col("eu"))
        & (F.col("et") > F.col("pt"))
        & (F.col("et") <= F.col("pt") + F.expr("interval 5 minutes")),
        "left",
    ).select("purchase_id", "error_id")
    bset = {(r["purchase_id"], r["error_id"]) for r in b.collect()}
    assert len(s) > 0
    # matched pairs must agree exactly
    assert {x for x in s if x[1] is not None} == {
        x for x in bset if x[1] is not None
    }
    # unmatched (NULL) rows: streaming may legitimately withhold
    # purchases whose join window extends past the final watermark
    # (tail of the stream) — everything else must agree
    assert {x for x in s if x[1] is None} <= {x for x in bset if x[1] is None}
    missing = {x[0] for x in bset if x[1] is None} - {x[0] for x in s}
    if missing:
        max_p = p.agg(F.max("pt")).collect()[0][0]
        max_e = e.agg(F.max("et")).collect()[0][0]
        import datetime

        final_wm = min(max_p, max_e) - datetime.timedelta(minutes=10)
        tail = {
            r["purchase_id"]
            for r in p.filter(
                F.col("pt") + F.expr("interval 5 minutes")
                >= F.lit(final_wm)
            ).collect()
        }
        assert missing <= tail, (missing - tail, final_wm)


def test_stream_tumbling_append_emits_exactly_closed_windows(spark):
    """Append mode must emit a window exactly once when the final
    watermark (max event time - 1 h) passes its end, with values equal
    to batch, and must NOT emit still-open tail windows."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    batch = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in registry.QUERIES["ev_tumbling"](spark, SF).collect()
    }
    stream = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in registry.QUERIES["stream_tumbling_append"](spark, SF).collect()
    }
    wm = Catalog(spark, SF)["events"].agg(F.max("ts")).collect()[0][0] - timedelta(
        hours=1
    )
    expected = {
        k: v
        for k, v in batch.items()
        if __import__("datetime").datetime.strptime(k[0], "%Y-%m-%d %H:%M")
        + timedelta(hours=1)
        <= wm
    }
    assert stream == expected
    assert set(batch) - set(stream), "tail windows should remain unemitted"
