"""Structured Streaming jobs over the events stream.

The file source here stands in for Kafka: a staged directory of parquet
files consumed with `availableNow` (bounded reprocess — the testable
mode) behaves exactly like a resumable unbounded stream with watermarks
and state. Each run uses a fresh checkpoint so results are a full
deterministic reprocess.

Production notes per job are in the docstrings; state is always bounded
by a watermark or state timeout — unbounded state is the way streaming
jobs die at scale.
"""

from __future__ import annotations

import itertools
import os
import shutil
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

REPO_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp")

# events.parquet physical schema. The driver has shipped ts as both
# TIMESTAMP(NANOS) (→ long under the session's nanosAsLong setting) and
# TIMESTAMP(MICROS) without isAdjustedToUTC (→ timestamp_ntz); probe the
# staged file's footer so the stream schema matches whichever this
# round's testdata uses.
def _events_stream_schema(staged_file: str) -> str:
    import pyarrow.parquet as pq

    t = str(pq.read_schema(staged_file).field("ts").type)
    ts_type = "long" if t.startswith("int") or "ns" in t else "timestamp_ntz"
    return (
        f"event_id long, ts {ts_type}, user_id long, "
        "event_type string, value double, props string"
    )

_counter = itertools.count()


def stage_events_stream(sf_dir: str) -> str:
    """Copy the events table into a repo-local stream input directory
    (a file-source 'topic'). Idempotent per sf_dir."""
    name = sf_dir.rstrip("/").replace("/", "_").strip("_")
    dest = os.path.join(REPO_TMP, f"stream_in_{name}")
    os.makedirs(dest, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    target = os.path.join(dest, "events.parquet")
    # idempotence keyed on (mtime, size), not bare existence — a
    # regenerated source at the same path must invalidate the staged copy
    # or streaming results silently diverge from batch
    sstat = os.stat(src)
    if (
        not os.path.exists(target)
        or os.path.getsize(target) != sstat.st_size
        or os.path.getmtime(target) < sstat.st_mtime
    ):
        shutil.copyfile(src, target)
    return dest


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mister_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    src = stage_events_stream(sf_dir)
    schema = _events_stream_schema(os.path.join(src, "events.parquet"))
    raw = spark.readStream.schema(schema).parquet(src)
    if " ts long" in schema:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute with availableNow into a memory sink; return the result
    as a batch DataFrame. Fresh checkpoint per run → full reprocess."""
    spark = stream_df.sparkSession
    name = f"ms_stream_{next(_counter)}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO_TMP, "ckpt", name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out


def run_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with a 1-hour watermark.
    Matches the batch ev_tumbling exactly on a bounded replay (verified
    in tests). NOTE: complete output mode retains ALL window state for
    the stream's lifetime — Spark does not evict windows in complete
    mode even with a watermark set (the watermark only drops late
    input). That is fine for this bounded availableNow replay, where
    complete mode is what makes the result equal the batch query; a
    long-running deployment would use append mode, where the watermark
    finalizes and evicts each window."""
    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("total_c"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        "n",
        (F.col("total_c") / 100).alias("total"),
    )


def run_stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode tumbling aggregate — the production configuration of
    run_stream_tumbling: each 1-hour window is emitted exactly once,
    when the watermark (max event time − 1 h) passes its end, and its
    state is then EVICTED. State is therefore bounded by (watermark
    horizon / window size) open windows per key regardless of stream
    lifetime — the property complete mode lacks. The trade-off is that
    windows the final watermark never passed (the stream's tail) are
    still open at shutdown and unemitted; pytest pins exact parity with
    the batch query on every closed window."""
    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("total_c"),
        )
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        "n",
        (F.col("total_c") / 100).alias("total"),
    )


def run_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of dd_exact. dropDuplicates state is evicted once
    the watermark passes, so state is bounded by (horizon x arrival rate)."""
    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicates(["event_id"]).select("event_id", "user_id", "event_type")
    return _run_to_memory(deduped, "append")


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("next_sess", LongType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _sessionize_group(
    key: tuple, pdfs, state: GroupState
):
    """Custom stateful sessionizer: carries (last event time, next
    session ordinal) across micro-batches; emits closed+open sessions of
    this batch. With processing-time timeout the state for idle users is
    dropped — bounded state at 100 TB/day arrival rates."""
    (user_id,) = key
    if state.exists:
        last_us, next_sess = state.get
    else:
        last_us, next_sess = None, 1
    times: list[int] = []
    for pdf in pdfs:
        times.extend(int(t) for t in pdf["tus"])
    times.sort()
    sessions = []  # (sess_id, n, start, end)
    for t in times:
        if last_us is None or t - last_us > GAP_US:
            sessions.append([next_sess, 0, t, t])
            next_sess += 1
        sessions[-1][1] += 1
        sessions[-1][3] = t
        last_us = t
    state.update((last_us, next_sess))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "sess_id": [s[0] for s in sessions],
            "n_events": [s[1] for s in sessions],
            "start_us": [s[2] for s in sessions],
            "end_us": [s[3] for s in sessions],
        }
    )


def run_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (applyInPandasWithState), the streaming twin of batch ev_sessionize.
    On a single availableNow replay the emitted sessions equal the batch
    gaps-and-islands result (verified in tests)."""
    ev = _read_events_stream(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tus")
    )
    sess = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        # NoTimeout keeps the availableNow replay bounded (a processing-
        # time timeout schedules extra timer batches and the query never
        # terminates). A long-running deployment would use
        # EventTimeTimeout + watermark to evict idle users' state —
        # that configuration is run_stream_sessionize_evicting below,
        # with its eviction contract pinned in test_streaming.py.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(sess, "append")


# state for the evicting sessionizer: the still-open session rides in
# state so a timeout can emit it exactly once
SESSION_EVICT_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("open_sess", LongType()),
        StructField("open_n", LongType()),
        StructField("open_start", LongType()),
        StructField("open_end", LongType()),
    ]
)
SESSION_EVICT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("closed_by_timeout", LongType()),  # 0/1
    ]
)

GAP_MS = GAP_US // 1_000


def _sessionize_evict_group(key: tuple, pdfs, state: GroupState):
    """EventTimeTimeout sessionizer: sessions closed by a gap WITHIN the
    stream are emitted immediately; the still-open session is held in
    state and emitted EXACTLY ONCE when the watermark passes the
    session gap past its last event (state.hasTimedOut), after which
    the state is removed — idle keys cost nothing forever after."""
    (user_id,) = key
    if state.hasTimedOut:
        last_us, open_sess, open_n, open_start, open_end = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "sess_id": [open_sess],
                "n_events": [open_n],
                "start_us": [open_start],
                "end_us": [open_end],
                "closed_by_timeout": [1],
            }
        )
        return
    if state.exists:
        last_us, open_sess, open_n, open_start, open_end = state.get
    else:
        last_us, open_sess, open_n, open_start, open_end = None, 0, 0, 0, 0
    times: list[int] = []
    for pdf in pdfs:
        times.extend(int(t) for t in pdf["tus"])
    times.sort()
    closed = []  # (sess_id, n, start, end)
    for t in times:
        if last_us is None:
            open_sess, open_n, open_start, open_end = 1, 1, t, t
            last_us = t
        elif t - last_us > GAP_US:
            closed.append((open_sess, open_n, open_start, open_end))
            open_sess += 1
            open_n, open_start, open_end = 1, t, t
            last_us = t
        else:
            # In-gap merge. Within a batch `times` is sorted, but a
            # late-but-within-watermark event in a LATER micro-batch can
            # arrive with t < last_us; min/max so an out-of-order arrival
            # can never shrink the session bounds or the eviction timeout.
            open_n += 1
            open_start = min(open_start, t)
            open_end = max(open_end, t)
            last_us = max(last_us, t)
    state.update((last_us, open_sess, open_n, open_start, open_end))
    # evict once event time passes the gap beyond this key's last event
    state.setTimeoutTimestamp(last_us // 1_000 + GAP_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "sess_id": [c[0] for c in closed],
            "n_events": [c[1] for c in closed],
            "start_us": [c[2] for c in closed],
            "end_us": [c[3] for c in closed],
            "closed_by_timeout": [0] * len(closed),
        }
    )


def run_stream_sessionize_evicting(
    spark: SparkSession, input_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """The long-running deployment configuration of the stateful
    sessionizer: EventTimeTimeout + watermark evicts idle keys' state
    (bounded state at 100 TB/day arrival rates) and emits each evicted
    open session exactly once, flagged closed_by_timeout=1. Reads a
    staged parquet directory (user_id long, ts timestamp) one file per
    micro-batch so multi-batch watermark advancement is reproducible
    in tests."""
    ev = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
        .select("user_id", F.unix_micros("ts").alias("tus"), "ts")
    )
    sess = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_evict_group,
        outputStructType=SESSION_EVICT_OUT_SCHEMA,
        stateStructType=SESSION_EVICT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _run_to_memory(sess, "append")


def run_stream_foreach_batch(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """foreachBatch sink: per-micro-batch custom writer (the hook for
    idempotent upserts / multi-sink fan-out that format sinks can't
    express). Writes each batch as parquet keyed by batch id; returns
    the number of batches written."""
    ev = _read_events_stream(spark, sf_dir)
    batches: list[int] = []

    def _write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))
        batches.append(batch_id)

    name = f"ms_stream_fb_{next(_counter)}_{uuid.uuid4().hex[:8]}"
    q = (
        ev.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", os.path.join(REPO_TMP, "ckpt", name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(batches)


def run_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate (1 h length / 30 min slide) with a
    1-hour watermark — the streaming twin of batch ev_sliding, same
    output contract (wstart_us, event_type, n, total).

    NOTE: as with run_stream_tumbling, complete output mode retains all
    window state regardless of the watermark (eviction only happens in
    append/update modes) — acceptable for the bounded availableNow
    replay this job exists to verify; production would run append mode
    so state is (horizon / slide) open windows per key."""
    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("total_c"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("wstart_us"),
        "event_type",
        "n",
        (F.col("total_c") / 100).alias("total"),
    )


def run_stream_sliding_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-mode sliding aggregate — the long-running configuration of
    run_stream_sliding: each micro-batch emits only the windows whose
    totals CHANGED in that batch, and the watermark evicts a window's
    state once it passes (so, unlike complete mode, neither state nor
    per-trigger output grows with stream lifetime; unlike append mode,
    consumers see running totals immediately instead of waiting for the
    window to close). A window's final value is its LAST emission, so
    the sink must upsert by key: here foreachBatch appends each batch
    (tagged with its batch_id) to parquet — a distributed write, nothing
    driver-sized — and the per-key max-batch row is the upserted state,
    resolved with one max(struct(batch, vals)) aggregate. Pytest pins
    exact parity with batch ev_sliding on the bounded replay."""
    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("total_c"),
        )
    )
    name = f"ms_stream_{next(_counter)}_{uuid.uuid4().hex[:8]}"
    out_dir = os.path.join(REPO_TMP, "upd", name)
    ckpt = os.path.join(REPO_TMP, "ckpt", name)

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        agg.writeStream.foreachBatch(upsert_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.read.parquet(out_dir)
    last = res.groupBy(F.col("w.start").alias("ws"), "event_type").agg(
        F.max(F.struct("_bid", "n", "total_c")).alias("s")
    )
    return last.select(
        F.unix_micros(F.col("ws")).alias("wstart_us"),
        "event_type",
        F.col("s.n").alias("n"),
        (F.col("s.total_c") / 100).alias("total"),
    )


def run_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension (user_id -> c_custkey) and aggregate value per market
    segment. The static side is broadcast into every micro-batch — the
    canonical Kafka-stream x dimension-table pattern; the dim is re-read
    per batch, so slowly-changing dimensions pick up updates for free."""
    from mister_spark.catalog import Catalog

    ev = _read_events_stream(spark, sf_dir)
    cust = Catalog(spark, sf_dir)["customer"].select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("total_c"),
    )
    out = _run_to_memory(agg, "complete")
    return out.select("c_mktsegment", "n", (F.col("total_c") / 100).alias("total"))


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases x errors for the same
    user with the error inside (purchase, purchase + 5 min] — the
    streaming twin of batch ev_range_join (operators/events.py), same
    output contract (purchase_id, error_id).

    Both sides carry a watermark and the join condition bounds event
    time in BOTH directions, so Spark can prove when a row can no
    longer match and evict it: per-side state is the last
    watermark + band worth of rows, not the whole stream. An inner
    interval join in append mode emits each pair exactly once, as soon
    as both rows have arrived. This is the canonical clickstream
    attribution join (impression x conversion within N minutes)."""
    purchases = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    errors = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "10 minutes")
    )
    joined = purchases.join(
        errors,
        F.expr(
            "p_user = e_user AND e_ts > p_ts AND e_ts <= p_ts + interval 5 minutes"
        ),
    )
    out = _run_to_memory(joined.select("purchase_id", "error_id"), "append")
    return out


def run_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits,
    matched to errors in its 5-minute window or with a NULL error_id
    once the watermark proves no match can still arrive. The outer side
    is the attribution case the inner join can't answer: "which
    purchases had NO nearby error?"

    Outer results cannot stream out eagerly — a purchase is only
    provably unmatched when the watermark passes its window end, so
    emission latency is the watermark delay; purchases whose window
    extends past the FINAL watermark (the stream's tail) correctly
    remain in state, still awaiting proof. The parity test accounts
    for exactly that tail window."""
    purchases = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    errors = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "10 minutes")
    )
    joined = purchases.join(
        errors,
        F.expr(
            "p_user = e_user AND e_ts > p_ts AND e_ts <= p_ts + interval 5 minutes"
        ),
        "leftOuter",
    )
    return _run_to_memory(joined.select("purchase_id", "error_id"), "append")


QUOTA_K = 5

QUOTA_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("k_index", LongType()),
    ]
)

QUOTA_STATE_SCHEMA = StructType([StructField("n_seen", LongType())])


def _quota_group(key: tuple, pdfs, state: GroupState):
    """Per-user admission quota: pass through each user's first K events
    (by event time, event_id tiebreak) and drop the rest. State is one
    counter per user — the minimal stateful rate-limit / reservoir gate
    a streaming ingest pipeline puts in front of an expensive stage."""
    (user_id,) = key
    n_seen = state.get[0] if state.exists else 0
    rows = []
    for pdf in pdfs:
        rows.extend(
            (int(t), int(e)) for t, e in zip(pdf["tus"], pdf["event_id"])
        )
    rows.sort()
    out = []
    for tus, event_id in rows:
        if n_seen < QUOTA_K:
            n_seen += 1
            out.append((user_id, event_id, n_seen))
    state.update((n_seen,))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "k_index"])


def run_stream_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming per-user quota (first K=5 events pass) via
    applyInPandasWithState — the streaming twin of a row_number()<=K
    batch window. On a single availableNow replay the admitted set
    equals the batch computation exactly (verified in tests); a
    long-running deployment adds EventTimeTimeout to drop idle users'
    counters."""
    ev = _read_events_stream(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tus"), "event_id"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _quota_group,
        outputStructType=QUOTA_OUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "append")


# --- exponentially decayed counts (mergeable aging state) -------------
DECAY_HALFLIFE_DAYS = 14.0  # matches operators/extras85.ev_decayed_counts
_DECAY_LAM = 0.6931471805599453 / (DECAY_HALFLIFE_DAYS * 86400.0)


def _stage_events_stream_chunked(spark: SparkSession, sf_dir: str, parts: int = 3) -> str:
    """Stage the events table as `parts` range-partitioned parquet
    files so maxFilesPerTrigger=1 yields a genuine multi-batch replay
    (one staged file → one micro-batch → the state merge actually
    runs more than once)."""
    name = sf_dir.rstrip("/").replace("/", "_").strip("_")
    dest = os.path.join(REPO_TMP, f"stream_in_chunked_{name}")
    src = os.path.join(sf_dir, "events.parquet")
    marker = os.path.join(dest, "_staged_from")
    sig = f"{os.path.getmtime(src)}:{os.path.getsize(src)}:{parts}"
    if os.path.exists(marker) and open(marker).read() == sig:
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    from mister_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir)["events"].select(
        "event_id",
        F.unix_micros("ts").alias("ts"),  # plain long micros: one stable
        "user_id",                        # physical type for the stream
        "event_type",
        "value",
        "props",
    )
    ev.repartitionByRange(parts, "ts").write.mode("overwrite").parquet(dest)
    with open(marker, "w") as fh:
        fh.write(sig)
    return dest


def run_stream_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ev_decayed_counts (same half-life): state is
    per event type (raw_count, decayed_sum, anchor) where decayed_sum
    is aged TO the anchor; each micro-batch contributes its own
    partial aged to the batch anchor, and the two merge with
    state·e^(−λΔ) + batch under the max anchor — the associative rule
    that makes exponential decay a mergeable (hence streamable,
    shardable) aggregate. The bounded replay runs ≥2 real micro-batches
    (maxFilesPerTrigger=1 over a range-chunked staging) and pytest pins
    parity with the batch operator to the 1e-4 rounding grid.

    Scale: each micro-batch does ONE partial-agg shuffle of that batch
    to |types| rows; the collected merge state is |types|-sized
    (O(model), the kmeans-centroid rule), never data-sized."""
    from mister_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    src = _stage_events_stream_chunked(spark, sf_dir)
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )

    state: dict[str, list[float]] = {}  # etype -> [raw, decayed, anchor]
    n_batches = [0]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import math

        cached = batch_df.select(
            "event_type", F.col("ts").cast("long").alias("tsec")
        ).localCheckpoint()
        b_row = cached.agg(F.max("tsec").alias("amax")).collect()[0]
        if b_row["amax"] is None:
            return
        n_batches[0] += 1
        b_anchor = int(b_row["amax"])
        dec = (
            cached.groupBy("event_type")
            .agg(
                F.sum(
                    F.exp(
                        F.lit(-_DECAY_LAM)
                        * (F.lit(b_anchor) - F.col("tsec"))
                    )
                ).alias("dsum"),
                F.count(F.lit(1)).alias("raw"),
            )
            .collect()
        )
        s_anchor = max((v[2] for v in state.values()), default=float("-inf"))
        new_anchor = max(float(b_anchor), s_anchor)
        age_s = math.exp(-_DECAY_LAM * (new_anchor - s_anchor)) if state else 0.0
        age_b = math.exp(-_DECAY_LAM * (new_anchor - b_anchor))
        for v in state.values():
            v[1] *= age_s
            v[2] = new_anchor
        for r in dec:
            et = r["event_type"]
            cur = state.setdefault(et, [0.0, 0.0, new_anchor])
            cur[0] += float(r["raw"])
            cur[1] += float(r["dsum"]) * age_b
            cur[2] = new_anchor

    name = f"ms_stream_{next(_counter)}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO_TMP, "ckpt", name)
    q = (
        raw.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    out = [
        (
            et,
            int(v[0]),
            float(v[1]),
            float(v[1] / v[0]),
            n_batches[0],
        )
        for et, v in sorted(state.items())
    ]
    df = spark.createDataFrame(
        out,
        "event_type string, raw_count long, decayed_raw double, "
        "recency_raw double, n_batches long",
    )
    return df.select(
        "event_type",
        "raw_count",
        (F.floor(F.col("decayed_raw") * 10000 + F.lit(0.5)) / 10000).alias(
            "decayed_count"
        ),
        (F.floor(F.col("recency_raw") * 10000 + F.lit(0.5)) / 10000).alias(
            "recency_index"
        ),
        "n_batches",
    )


def run_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply into the transactional snapshot table
    (sources/snapshots.py): each micro-batch of events is reduced to
    its latest-per-user change row and MERGEd (upsert on user_id) into
    a versioned table via foreachBatch — the streaming half of a
    lakehouse ingestion pipeline. Last-write-wins is enforced by
    (ts, event_id) ORDER, not by arrival order: the batch's candidate
    rows are unioned with the table's current rows for the SAME keys
    and the max-(ts, event_id) winner is merged, so a late micro-batch
    can never regress a key (pytest replays batches and pins the final
    table equal to the batch latest-per-user ground truth, and pins
    that more than one snapshot version was committed).

    Scale: per batch, one latest-per-key partial agg of THAT batch +
    a key-intersection join against the table (stats-pruned
    copy-on-write in merge()); table versions advance atomically, so a
    crashed batch is invisible — the same idempotent upsert contract
    Delta/Iceberg streaming sinks implement."""
    import tempfile

    from mister_spark.session import ensure_runtime_confs
    from mister_spark.sources.snapshots import SnapshotTable

    ensure_runtime_confs(spark)
    src = _stage_events_stream_chunked(spark, sf_dir)
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    troot = tempfile.mkdtemp(prefix="cdc_merge_")
    table = SnapshotTable(spark, os.path.join(troot, "t"), stats_cols=["user_id"])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = F.max_by(
            F.struct(
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"),
                F.col("value").alias("last_value"),
            ),
            F.struct("ts", "event_id"),
        )
        cand = batch_df.groupBy("user_id").agg(w.alias("s")).select(
            "user_id", "s.*"
        )
        if cand.limit(1).count() == 0:
            return
        if table.current_version() is not None:
            keys = cand.select("user_id")
            cur = table.read().join(F.broadcast(keys), "user_id")
            cand = (
                cand.unionByName(cur)
                .groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct(
                            "last_ts",
                            "last_event_id",
                            "last_event_type",
                            "last_value",
                        ),
                        F.struct("last_ts", "last_event_id"),
                    ).alias("s")
                )
                .select("user_id", "s.*")
            )
        table.merge(cand, key="user_id")

    name = f"ms_stream_{next(_counter)}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO_TMP, "ckpt", name)
    q = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        table.read()
        .select(
            "user_id", "last_ts", "last_event_id", "last_event_type",
            "last_value",
        )
        .orderBy("user_id")
        .localCheckpoint()
    )
    # surface the commit history length so the rows-only check also
    # covers 'multiple versions actually committed'
    out = out.withColumn(
        "table_versions", F.lit(len(table.versions())).cast("int")
    )
    import shutil as _sh

    _sh.rmtree(troot, ignore_errors=True)
    return out
