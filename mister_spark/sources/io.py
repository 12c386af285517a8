"""Source/sink registry: parquet, ORC, CSV, JSON(L), text, in-memory.

Format-specific options are pinned to schema-stable defaults (headers on
CSV, explicit schemas honored, UTC timestamps via the session). Writers
support partitioned layout (`partition_by`) so downstream scans get
partition pruning, and sorted-within-partition layout (`sort_by`) so
min/max parquet page stats make range predicates cheap — the two layout
decisions that matter most at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ReaderFn = Callable[..., DataFrame]
WriterFn = Callable[..., None]

READERS: dict[str, ReaderFn] = {}
WRITERS: dict[str, WriterFn] = {}


def _reader(name: str):
    def deco(fn: ReaderFn) -> ReaderFn:
        READERS[name] = fn
        return fn

    return deco


def _writer(name: str):
    def deco(fn: WriterFn) -> WriterFn:
        WRITERS[name] = fn
        return fn

    return deco


def read(spark: SparkSession, fmt: str, path: str, **opts) -> DataFrame:
    return READERS[fmt](spark, path, **opts)


def write(df: DataFrame, fmt: str, path: str, **opts) -> None:
    WRITERS[fmt](df, path, **opts)


@_reader("parquet")
def read_parquet(spark: SparkSession, path: str, **opts) -> DataFrame:
    return spark.read.options(**opts).parquet(path)


@_reader("csv")
def read_csv(spark: SparkSession, path: str, schema: str | None = None, **opts) -> DataFrame:
    r = spark.read.option("header", "true").options(**opts)
    # explicit schema beats inference: inference is an extra full pass
    # over the data and can flip types between runs
    return (r.schema(schema) if schema else r.option("inferSchema", "true")).csv(path)


@_reader("json")
def read_json(spark: SparkSession, path: str, schema: str | None = None, **opts) -> DataFrame:
    r = spark.read.options(**opts)
    return (r.schema(schema) if schema else r).json(path)


def _apply_layout(df: DataFrame, partition_by: list[str] | None, sort_by: list[str] | None):
    w = df
    if sort_by:
        # sortWithinPartitions → clustered parquet pages → effective
        # min/max pruning on range predicates without a global sort
        w = w.sortWithinPartitions(*sort_by)
    writer = w.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer


@_writer("parquet")
def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    _apply_layout(df, partition_by, sort_by).parquet(path)


@_reader("orc")
def read_orc(spark: SparkSession, path: str, **opts) -> DataFrame:
    return spark.read.options(**opts).orc(path)


@_writer("orc")
def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    # ORC gets the same layout controls as parquet: partition pruning +
    # clustered stripes (ORC keeps min/max stripe stats like parquet pages)
    _apply_layout(df, partition_by, sort_by).orc(path)


def _python_avro(spark: SparkSession) -> str:
    """Register and return the pure-Python Avro DataSource format.

    The JVM spark-avro connector (the production data plane — decode
    stays off Python) is tried first by the surfaces below; absent the
    jar, this fallback reads/writes the SAME object container format
    via `sources/avro_ds.py`, so files interoperate both ways within
    its type subset."""
    from mister_spark.sources.avro_ds import AVRO_FORMAT, register_avro_source

    register_avro_source(spark)
    return AVRO_FORMAT


def _avro_connector_absent(exc: Exception) -> bool:
    """True only when the failure means the spark-avro jar is missing.

    A genuine JVM-path failure (corrupt file, schema mismatch,
    permissions) must NOT be swallowed and retried via the pure-Python
    fallback — that would surface as an unrelated secondary error and
    mask the root cause. Spark raises 'Failed to find data source:
    avro' (AnalysisException) / ClassNotFoundException when the
    connector is absent; only those messages trigger the fallback."""
    msg = str(exc)
    return (
        "Failed to find data source" in msg
        or "FAILED_REGISTER_PROVIDER" in msg
        or "ClassNotFoundException" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
    )


@_reader("avro")
def read_avro(spark: SparkSession, path: str, **opts) -> DataFrame:
    """Avro read surface: spark-avro when the jar is on the classpath
    (`--packages org.apache.spark:spark-avro_2.13:<version>`), else
    the pure-Python container reader — one InputPartition per file,
    schema from the first file's embedded writer schema."""
    try:
        return spark.read.options(**opts).format("avro").load(path)
    except Exception as exc:
        if not _avro_connector_absent(exc):
            raise
        return (
            spark.read.format(_python_avro(spark)).options(**opts).load(path)
        )


@_writer("avro")
def write_avro(df: DataFrame, path: str, **opts) -> None:
    try:
        df.write.mode("overwrite").options(**opts).format("avro").save(path)
    except Exception as exc:
        if not _avro_connector_absent(exc):
            raise
        spark = df.sparkSession
        (
            df.write.format(_python_avro(spark))
            .mode("overwrite")
            .options(**opts)
            .save(path)
        )


@_reader("text")
def read_text(spark: SparkSession, path: str, **opts) -> DataFrame:
    """One string column `value` per line — the raw-corpus entry point."""
    return spark.read.options(**opts).text(path)


@_writer("text")
def write_text(df: DataFrame, path: str, **opts) -> None:
    df.write.mode("overwrite").options(**opts).text(path)


@_writer("csv")
def write_csv(df: DataFrame, path: str, **opts) -> None:
    df.write.mode("overwrite").option("header", "true").options(**opts).csv(path)


@_writer("json")
def write_json(df: DataFrame, path: str, **opts) -> None:
    df.write.mode("overwrite").options(**opts).json(path)
