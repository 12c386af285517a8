"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a multi-executor cluster: every knob here is
chosen to also be the right default at 1000-executor / 100 TB scale
(AQE on with skew-join + partition coalescing, Arrow for the few Pandas
UDF paths, UTC timestamps for cross-engine determinism). Only
``shuffle_partitions`` and memory need re-tuning on a real cluster.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

_RELIABLE_PATCHED = False


def reliable_checkpoint_requested() -> bool:
    return os.environ.get("MISTER_SPARK_RELIABLE_CHECKPOINT", "") not in (
        "",
        "0",
        "false",
    )


def install_reliable_checkpoint(spark: SparkSession) -> None:
    """Cluster-safety switch (round-11 verdict item 5): route every
    ``DataFrame.localCheckpoint()`` in the engine through reliable
    ``.checkpoint()`` instead.

    ``localCheckpoint`` stores blocks as non-replicated executor state —
    the right default on local[N] (no network, no executor loss) but on
    a 1000-executor cluster one lost executor invalidates the lineage-
    truncated frame and fails the query. With
    ``MISTER_SPARK_RELIABLE_CHECKPOINT=1`` the blocks go to the
    fault-tolerant checkpoint dir (``MISTER_SPARK_CHECKPOINT_DIR``,
    which should be cluster-visible storage — HDFS/object store — in
    production; defaults to a local temp dir so the switch is testable
    anywhere). Patching the classic DataFrame method is deliberate: the
    engine has ~500 materialization sites and they must all follow the
    switch, not just the ones routed through a helper."""
    global _RELIABLE_PATCHED
    sc = spark.sparkContext
    if not sc._jsc.sc().getCheckpointDir().isDefined():
        sc.setCheckpointDir(
            os.environ.get("MISTER_SPARK_CHECKPOINT_DIR")
            or os.path.join(tempfile.gettempdir(), "mister_spark_ckpt")
        )
    if _RELIABLE_PATCHED:
        return
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    def _reliable_local_checkpoint(self, eager: bool = True):
        return _ClassicDF.checkpoint(self, eager=eager)

    _reliable_local_checkpoint._mister_spark_reliable = True  # type: ignore[attr-defined]
    _ClassicDF.localCheckpoint = _reliable_local_checkpoint  # type: ignore[method-assign]
    _RELIABLE_PATCHED = True


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
    if reliable_checkpoint_requested():
        install_reliable_checkpoint(spark)
    return spark
