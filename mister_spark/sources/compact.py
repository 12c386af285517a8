"""Small-file compaction — the table-maintenance chore every big
deployment runs nightly.

Streaming sinks, over-parallel writers, and per-partition appends leave
thousands of KB-sized files; at 100 TB the resulting file-listing and
task-scheduling overhead dominates scan time (a 1000-executor job over
10M tiny files spends minutes just planning). Compaction rewrites a
directory into ~target-sized files.

Sizing uses the actual on-disk bytes (listed through Hadoop's
FileSystem API, so it works on any supported filesystem, not just
local), and the rewrite is repartition(n) — a full shuffle, which is
exactly what we want: it rebalances regardless of input skew. The
rewrite goes to a temp sibling directory first and swaps in via rename,
so readers never observe a half-written table.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under `path` via the Hadoop FileSystem API
    (portable across local/HDFS/object stores)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return int(fs.getContentSummary(p).getLength())


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite the dataset at `path` into ceil(bytes/target_mb) files.
    Returns the file count written. Atomic swap: write to `path.__compact__`,
    then rename over the original."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(conf)

    n = max(1, math.ceil(dir_bytes(spark, path) / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact__"
    tp = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(tp):
        fs.delete(tp, True)
    df.repartition(n).write.mode("overwrite").format(fmt).save(tmp)
    fs.delete(hp, True)
    fs.rename(tp, hp)
    return n
