"""Named access to the driver-generated parquet tables.

One parquet file per table (TESTDATA.md). Loads are lazy DataFrames —
Catalyst prunes columns and pushes filters into the scan, so callers
should select/filter on the returned frame rather than pre-materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/part grow slowly vs. facts).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


class Catalog:
    """``Catalog(spark, sf_dir)[name]`` → DataFrame for that table."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        from mister_spark.session import ensure_runtime_confs

        ensure_runtime_confs(spark)
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
        if name == "events":
            # Normalize ts to a plain UTC TIMESTAMP whatever the driver
            # wrote this round: TIMESTAMP(NANOS) reads as long nanos
            # (session.py sets nanosAsLong), TIMESTAMP(MICROS) without
            # isAdjustedToUTC reads as TIMESTAMP_NTZ. Session tz is
            # pinned UTC, so the NTZ→TZ cast preserves the wall-clock
            # value as a UTC instant — exactly DuckDB's naive-timestamp
            # + epoch_us semantics.
            from pyspark.sql import functions as F

            t = dict(df.dtypes).get("ts")
            if t == "bigint":
                # integer div: float division rounds at ~1e15 and can be
                # 1 µs off vs DuckDB's truncating epoch_us
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif t == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self[name].createOrReplaceTempView(name)
