"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a multi-executor cluster: every knob here is
chosen to also be the right default at 1000-executor / 100 TB scale
(AQE on with skew-join + partition coalescing, Arrow for the few Pandas
UDF paths, UTC timestamps for cross-engine determinism). Only
``shuffle_partitions`` and memory need re-tuning on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Defensively apply the runtime-settable confs correctness depends
    on, for sessions WE didn't build (e.g. the driver's): nanos
    timestamps read as long (events.parquet is TIMESTAMP(NANOS)) and
    UTC formatting so date strings match the DuckDB oracle regardless
    of the host timezone."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def get_session(
    app_name: str = "mister_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return (or create) the tuned session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count: at local scale bigger values
    only add scheduling overhead, and AQE coalesces anyway.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter pruning for selective fact-fact shuffle
        # joins. Injection requires the probe-side scan to exceed
        # applicationSideScanSizeThreshold (10 GB default) and the
        # build side to fit creationSideThreshold (10 MB) — so it is a
        # no-op at local test SF but fires on any real fact table
        # (tests/test_plans.py::test_runtime_bloom_filter_injection
        # proves the injection with the scan gate lowered)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as long and convert in Catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
