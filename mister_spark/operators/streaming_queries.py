"""Streaming operators exposed through the driver contract.

Each callable runs the stream to completion (availableNow bounded
replay) and returns the materialized result — rows-only checks for the
driver; exact batch-parity asserts live in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mister_spark.registry import query
from mister_spark.streaming import (
    run_stream_cdc_merge,
    run_stream_dedup,
    run_stream_enrich,
    run_stream_quota,
    run_stream_sessionize,
    run_stream_sliding,
    run_stream_sliding_update,
    run_stream_stream_join,
    run_stream_stream_left_join,
    run_stream_tumbling,
    run_stream_tumbling_append,
)


@query("stream_tumbling")  # streaming execution → rows-only; pytest parity
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_tumbling(spark, sf_dir)


@query("stream_tumbling_append")  # streaming execution → rows-only; pytest parity
def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_tumbling_append(spark, sf_dir)


@query("stream_dedup")  # streaming execution → rows-only; pytest parity
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_dedup(spark, sf_dir)


@query("stream_session_state")  # streaming execution → rows-only; pytest parity
def stream_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sessionize(spark, sf_dir)


@query("stream_sliding")  # streaming execution → rows-only; pytest parity
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sliding(spark, sf_dir)


@query("stream_sliding_update")  # streaming execution → rows-only; pytest parity
def stream_sliding_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sliding_update(spark, sf_dir)


@query("stream_enrich")  # streaming execution → rows-only; pytest parity
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_enrich(spark, sf_dir)


@query("stream_stream_join")  # streaming execution → rows-only; pytest parity
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_join(spark, sf_dir)


@query("stream_stream_left_join")  # streaming execution → rows-only; pytest parity
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_left_join(spark, sf_dir)


@query("stream_quota")  # streaming execution → rows-only; pytest parity
def stream_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_quota(spark, sf_dir)


@query("stream_cdc_merge")  # streaming execution → rows-only; pytest parity
def stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_cdc_merge(spark, sf_dir)
