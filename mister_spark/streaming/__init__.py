from mister_spark.streaming.jobs import (
    run_stream_cdc_merge,
    run_stream_dedup,
    run_stream_quota,
    run_stream_enrich,
    run_stream_sessionize,
    run_stream_sliding,
    run_stream_sliding_update,
    run_stream_stream_join,
    run_stream_stream_left_join,
    run_stream_tumbling,
    run_stream_tumbling_append,
    stage_events_stream,
)
from mister_spark.streaming.kafka import (
    kafka_sink_options,
    kafka_source_options,
    read_kafka_stream,
)

__all__ = [
    "run_stream_cdc_merge",
    "run_stream_dedup",
    "run_stream_quota",
    "run_stream_enrich",
    "run_stream_sessionize",
    "run_stream_sliding",
    "run_stream_sliding_update",
    "run_stream_stream_join",
    "run_stream_stream_left_join",
    "run_stream_tumbling",
    "run_stream_tumbling_append",
    "stage_events_stream",
    "kafka_sink_options",
    "kafka_source_options",
    "read_kafka_stream",
]
