from mister_spark.streaming.jobs import (
    run_stream_dedup,
    run_stream_sessionize,
    run_stream_tumbling,
    stage_events_stream,
)

__all__ = [
    "run_stream_dedup",
    "run_stream_sessionize",
    "run_stream_tumbling",
    "stage_events_stream",
]
