"""Idempotent derived-layout staging for layout-demonstrating queries.

io_partitioned_prune / io_bucketed_join need a *written* layout
(partitioned directory tree, bucketed table) to read back, but driver
query callables must be cheap to call repeatedly. Each stager keys its
work on the source parquet's (mtime, size) via a marker file and skips
the rewrite when the marker matches — the same invalidation rule
stage_events_stream uses, so regenerated testdata at the same path
invalidates stale layouts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

REPO_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
)


def _tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").replace("/", "_").strip("_")


def _marker_current(marker: str, src: str) -> bool:
    try:
        with open(marker) as f:
            rec = json.load(f)
        st = os.stat(src)
        return rec == {"mtime": st.st_mtime, "size": st.st_size}
    except (OSError, ValueError):
        return False


def _write_marker(marker: str, src: str) -> None:
    st = os.stat(src)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"mtime": st.st_mtime, "size": st.st_size}, f)


def stage_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders rewritten as a Hive-style directory tree partitioned by
    o_orderpriority. Reading it with a priority predicate turns the
    filter into directory-level partition pruning (PartitionFilters in
    the scan) — zero IO for non-matching partitions, the core 100 TB
    layout lever for low-cardinality hot filters."""
    src = os.path.join(sf_dir, "orders.parquet")
    dest = os.path.join(REPO_TMP, f"part_orders_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src)
        (
            df.repartition("o_orderpriority")
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(dest)
        )
        _write_marker(marker, src)
    return dest


def stage_bucketed_order_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders + lineitem persisted as same-bucketed managed tables
    (16 buckets on the orderkey). The bucketed write pays the orderkey
    shuffle ONCE; every later orders⋈lineitem join reads matching
    buckets side by side with zero exchange (pinned in
    tests/test_wave10.py). Returns (orders_table, lineitem_table)."""
    from mister_spark.sources.bucketed import write_bucketed

    tag = _tag(sf_dir).replace(".", "_").replace("-", "_")
    to, tl = f"b_orders_{tag}", f"b_lineitem_{tag}"
    src = os.path.join(sf_dir, "lineitem.parquet")
    marker = os.path.join(REPO_TMP, f"bucketed_{tag}.marker")
    have = spark.catalog.tableExists(to) and spark.catalog.tableExists(tl)
    if not (have and _marker_current(marker, src)):
        write_bucketed(
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet")),
            to,
            "o_orderkey",
        )
        write_bucketed(spark.read.parquet(src), tl, "l_orderkey")
        _write_marker(marker, src)
    return to, tl


def stage_csv_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders rewritten as headered CSV (timestamps as ISO strings) —
    the untyped-ingest twin of the parquet original for io_csv_query."""
    src = os.path.join(sf_dir, "orders.parquet")
    dest = os.path.join(REPO_TMP, f"csv_orders_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src)
        df.write.mode("overwrite").option("header", True).option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        ).csv(dest)
        _write_marker(marker, src)
    return dest


def stage_corrupt_csv_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders as headerless CSV with a deliberately unparseable
    totalprice ('#BAD#') on every o_orderkey % 41 == 0 row — the dirty
    vendor-feed fixture for io_corrupt_records. Lines are built with
    concat_ws so the corruption is deterministic and parallel."""
    from pyspark.sql import functions as F

    src = os.path.join(sf_dir, "orders.parquet")
    dest = os.path.join(REPO_TMP, f"corrupt_csv_orders_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src)
        lines = df.select(
            F.concat_ws(
                ",",
                F.col("o_orderkey"),
                F.col("o_custkey"),
                F.col("o_orderstatus"),
                F.when(F.col("o_orderkey") % 41 == 0, F.lit("#BAD#"))
                .otherwise(F.col("o_totalprice").cast("string")),
            ).alias("value")
        )
        lines.write.mode("overwrite").text(dest)
        _write_marker(marker, src)
    return dest


def stage_json_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders rewritten as JSONL (ISO timestamps) for io_json_query."""
    src = os.path.join(sf_dir, "orders.parquet")
    dest = os.path.join(REPO_TMP, f"json_orders_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src)
        df.write.mode("overwrite").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        ).json(dest)
        _write_marker(marker, src)
    return dest


def stage_orc_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """lineitem rewritten as ORC for io_orc_query."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    dest = os.path.join(REPO_TMP, f"orc_lineitem_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        spark.read.parquet(src).write.mode("overwrite").orc(dest)
        _write_marker(marker, src)
    return dest


def stage_sorted_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """lineitem rewritten range-clustered on l_shipdate (8 range
    partitions, sorted within each) for io_zone_map_prune: every parquet
    row group covers a narrow shipdate band, so a shipdate range filter
    skips most row groups from footer min/max stats alone — the
    sort-clustering complement to directory-level partition pruning
    (which needs a low-cardinality key; date ranges want clustering)."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    dest = os.path.join(REPO_TMP, f"sorted_lineitem_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src)
        (
            df.repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(dest)
        )
        _write_marker(marker, src)
    return dest


def stage_small_files_events(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """events staged as 64 tiny parquet files (the streaming-ingest
    landing pathology), plus its coalesce-compacted rewrite — the pair
    io_small_files_compaction reports on. Returns (small_dir,
    compact_dir)."""
    src = os.path.join(sf_dir, "events.parquet")
    small = os.path.join(REPO_TMP, f"small_events_{_tag(sf_dir)}")
    compact = os.path.join(REPO_TMP, f"compact_events_{_tag(sf_dir)}")
    marker = small + ".marker"
    if not (
        _marker_current(marker, src)
        and os.path.isdir(small)
        and os.path.isdir(compact)
    ):
        df = spark.read.parquet(src)
        df.repartition(64).write.mode("overwrite").parquet(small)
        # compaction: shuffle-free partition concatenation
        spark.read.parquet(small).coalesce(4).write.mode("overwrite").parquet(
            compact
        )
        _write_marker(marker, src)
    return small, compact


def stage_xml_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders staged as XML (Spark 4's built-in xml source, rowTag
    'order') — the document-interchange ingest path: B2B feeds, config
    exports, and legacy enterprise dumps still arrive as XML, and
    Spark 4 reads them natively (no external package). Same
    marker-invalidation contract as the CSV stager."""
    src = os.path.join(sf_dir, "orders.parquet")
    dest = os.path.join(REPO_TMP, f"xml_orders_{_tag(sf_dir)}")
    marker = dest + ".marker"
    if not (_marker_current(marker, src) and os.path.isdir(dest)):
        df = spark.read.parquet(src).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
        (
            df.write.mode("overwrite")
            .format("xml")
            .option("rowTag", "order")
            .save(dest)
        )
        _write_marker(marker, src)
    return dest
