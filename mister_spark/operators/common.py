"""Shared expression helpers + cross-engine determinism rules.

Rules (SURVEY.md §4): money sums → round(x, 2); ratios/avgs → round(x, 4);
counts stay bigint; timestamps truncated with date_trunc; every computed
column aliased identically in the Spark plan and the DuckDB oracle; any
top-k sorts on the *rounded* measure plus explicit tiebreak keys so both
engines select the same rows.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, functions as F

from mister_spark.catalog import Catalog

# checkpoint_partitioned flips a session-global conf for the duration of
# one eager materialization; the lock keeps two concurrent callers from
# interleaving their flip/restore and leaving AQE off (round-11 verdict
# item 5). A concurrent UNRELATED query compiled inside the window still
# sees AQE off — acceptable (plans stay correct, only adaptivity is
# lost for that one compile) and unavoidable without per-plan conf.
_AQE_FLIP_LOCK = threading.Lock()


def checkpoint_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """repartition(cols) + localCheckpoint, materialized with AQE OFF so
    the checkpointed RDD advertises its hash partitioning. Under AQE the
    LogicalRDD reports unknown partitioning and every downstream
    join/aggregate on the same key re-shuffles the frame — this is what
    makes guide §2.4's "establish the partitioning once, reuse it every
    iteration" actually hold for loop-invariant state. AQE is restored
    immediately (localCheckpoint is eager); every other query keeps it.
    (localCheckpoint routes to reliable .checkpoint() under
    MISTER_SPARK_RELIABLE_CHECKPOINT — see mister_spark.session.)"""
    spark = df.sparkSession
    with _AQE_FLIP_LOCK:
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return df.repartition(*cols).localCheckpoint()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)


def spread(df: DataFrame) -> DataFrame:
    """Raise the parallelism of an expression-heavy stage when the
    input scan has fewer splits than the cluster has slots (guide §6
    input split size / §2.5 input skew). documents.parquet at bench SFs
    is a single small file → 1-2 scan tasks, so tokenize/shingle
    expression work — the dominant cost of every text operator — runs
    on 2 of 32 cores. One cheap round-robin shuffle of the raw rows
    unlocks the full cluster. Scale-adaptive by construction: at real
    scale the scan has >= defaultParallelism splits and this is a
    no-op (no repartition node is even added)."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def rnd(col: Column, n: int) -> Column:
    """Cross-engine-deterministic rounding: floor(x*10^n + 0.5)/10^n.

    Spark's round() (BigDecimal HALF_UP on the shortest decimal repr)
    and DuckDB's round() (float math) disagree on values that land
    exactly on a half — common for row-level products of 2-decimal
    inputs and small-denominator ratios. The floor form is identical
    double arithmetic in both engines, so results match bit-for-bit.
    Mirror in SQL as FLOOR((x) * 10^n + 0.5) / 10^n.
    """
    m = 10**n
    return F.floor(col * m + F.lit(0.5)) / m


def money(col: Column) -> Column:
    return rnd(col, 2)


def ratio(col: Column) -> Column:
    return rnd(col, 4)


def ts(lit: str) -> Column:
    """Timestamp literal (tables store dates as timestamps)."""
    return F.lit(lit).cast("timestamp")


def revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# canonical definitions live in the public function library
from mister_spark.functions.text import DUCK_TOKENS, tokens  # noqa: E402,F401


def cat(spark, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)
