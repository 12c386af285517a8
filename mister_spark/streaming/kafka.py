"""Kafka-shaped source/sink surface.

The container has no Kafka broker and no spark-sql-kafka connector jar,
so nothing here can *run* in tests — but the deployment surface is real:
`kafka_source_options` / `kafka_sink_options` pin the production option
set (earliest offsets bounded per trigger, fail-fast on data loss), and
`read_kafka_stream` builds the full readStream plan including the
JSON-value projection identical to the file-source twin in jobs.py.

A deployment swaps `_read_events_stream` for `read_kafka_stream` and
every job in jobs.py runs unchanged — that swap-point is what
tests/test_streaming.py::test_kafka_surface checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# value payload for an events topic: same logical schema the file twin
# reads, with ts as epoch micros in the JSON
EVENTS_VALUE_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, "
    "value double, props string"
)


def kafka_source_options(
    brokers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 1_000_000,
) -> dict[str, str]:
    """Production-shaped Kafka source options: bounded per-trigger reads
    (backpressure), fail-on-data-loss on so silent topic truncation
    breaks the job instead of the data."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        "failOnDataLoss": "true",
    }


def kafka_sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def read_kafka_stream(
    spark: SparkSession, brokers: str, topic: str, **opts
) -> DataFrame:
    """Build the Kafka readStream plan: raw (key, value, timestamp) →
    JSON-parsed events with a proper event-time column, matching the
    schema `jobs._read_events_stream` produces, so every streaming job
    runs on either source.

    Raises RuntimeError with a clear message when the Kafka connector
    jar is absent (this container) — the plan itself is checked in
    tests by inspecting the generated options."""
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(brokers, topic), **opts
    )
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent locally
        raise RuntimeError(
            "Kafka connector not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from e
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_VALUE_SCHEMA).alias("j")
    )
    return parsed.select(
        F.col("j.event_id").alias("event_id"),
        F.timestamp_micros(F.col("j.ts_us")).alias("ts"),
        F.col("j.user_id").alias("user_id"),
        F.col("j.event_type").alias("event_type"),
        F.col("j.value").alias("value"),
        F.col("j.props").alias("props"),
    )
