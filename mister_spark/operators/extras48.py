"""Wave 48: storage-engine operations — table stats, vacuum, Z-order
layout, and join-key skew audit.

io_column_stats is ANALYZE TABLE (the numbers a cost-based optimizer
and a zone-map both need); io_snapshot_vacuum is the retention step
every transactional table format ships (physically drop old versions,
fail time travel loudly); io_zorder_layout demonstrates WHY multi-dim
clustering works — Morton-interleaved buckets cover a small range of
BOTH keys, so zone-map pruning fires for either predicate;
io_partition_skew_audit measures rows-per-key skew on a join key —
the number that decides between a plain shuffle join, AQE skew
handling, and explicit salting (functions/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

Z_BITS = 8  # per-dimension grid resolution
Z_BUCKETS = 64  # top 6 morton bits
STATS_NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STATS_STR_COLS = ["o_orderstatus"]
SKEW_KEY = "l_suppkey"


def _morton(xg: Column, yg: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low `bits` of xg (even positions) and yg (odd) —
    integer div/mod arithmetic only, mirrored verbatim in SQL."""
    out = F.lit(0)
    for i in range(bits):
        out = out + ((xg / (2**i)).cast("long") % 2) * (2 ** (2 * i))
        out = out + ((yg / (2**i)).cast("long") % 2) * (2 ** (2 * i + 1))
    return out


def _morton_sql(xg: str, yg: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({xg} // {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"(({yg} // {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


_ZG = f"""
      b AS (SELECT o_custkey AS ck,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS dy
            FROM orders),
      r AS (SELECT MIN(ck) AS ckmn, MAX(ck) AS ckmx,
                   MIN(dy) AS dymn, MAX(dy) AS dymx FROM b),
      g AS (SELECT ck, dy,
                   CAST(((ck - ckmn) * {2**Z_BITS}) // (ckmx - ckmn + 1)
                        AS BIGINT) AS xg,
                   CAST(((dy - dymn) * {2**Z_BITS}) // (dymx - dymn + 1)
                        AS BIGINT) AS yg,
                   ckmx - ckmn AS ckrange, dymx - dymn AS dyrange
            FROM b, r)
"""


@query(
    "io_zorder_layout",
    oracle=f"""
    WITH {_ZG},
    z AS (SELECT ck, dy, ckrange, dyrange,
                 {_morton_sql('xg', 'yg')} // {(4 ** Z_BITS) // Z_BUCKETS}
                   AS bucket,
                 xg // {(2 ** Z_BITS) // Z_BUCKETS} AS lin_bucket
          FROM g),
    per AS (
      SELECT 'zorder' AS layout, bucket,
             CAST(MAX(ck) - MIN(ck) AS DOUBLE) / MAX(ckrange) AS cks,
             CAST(MAX(dy) - MIN(dy) AS DOUBLE) / MAX(dyrange) AS dys
      FROM z GROUP BY bucket
      UNION ALL
      SELECT 'linear', lin_bucket,
             CAST(MAX(ck) - MIN(ck) AS DOUBLE) / MAX(ckrange),
             CAST(MAX(dy) - MIN(dy) AS DOUBLE) / MAX(dyrange)
      FROM z GROUP BY lin_bucket)
    SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           FLOOR(AVG(cks) * 10000 + 0.5) / 10000 AS avg_cust_span,
           FLOOR(AVG(dys) * 10000 + 0.5) / 10000 AS avg_day_span
    FROM per GROUP BY layout
    """,
)
def io_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit on orders(custkey ×
    order-day): grid both keys to {Z_BITS} bits, interleave, bucket by
    the top Morton bits, and report each layout's average per-bucket
    key-range coverage. The point the numbers make: Z-buckets cover a
    SMALL fraction of BOTH dimensions (zone-map pruning fires for a
    custkey predicate AND a date predicate), while linear custkey
    bucketing leaves day spans ≈ 1 (date predicates scan everything).
    This is the layout decision behind `io_zone_map_prune`.

    Scale: grid bounds are one tiny agg broadcast back; the Morton
    code is pure JVM arithmetic; per-bucket spans partial-agg into
    {Z_BUCKETS} rows per layout. Writing the clustered layout is then
    `repartitionByRange(morton)` + sortWithinPartitions — same plan
    shape as io_small_files_compaction."""
    orders = cat(spark, sf_dir)["orders"]
    b = orders.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dy"),
    )
    r = b.agg(
        F.min("ck").alias("ckmn"),
        F.max("ck").alias("ckmx"),
        F.min("dy").alias("dymn"),
        F.max("dy").alias("dymx"),
    )
    g = b.crossJoin(F.broadcast(r)).select(
        "ck",
        "dy",
        ((F.col("ck") - F.col("ckmn")) * (2**Z_BITS))
        .cast("long")
        .alias("_xs"),
        ((F.col("dy") - F.col("dymn")) * (2**Z_BITS))
        .cast("long")
        .alias("_ys"),
        (F.col("ckmx") - F.col("ckmn")).alias("ckrange"),
        (F.col("dymx") - F.col("dymn")).alias("dyrange"),
        (F.col("ckmx") - F.col("ckmn") + 1).alias("_ckd"),
        (F.col("dymx") - F.col("dymn") + 1).alias("_dyd"),
    )
    g = g.select(
        "ck",
        "dy",
        "ckrange",
        "dyrange",
        (F.col("_xs") / F.col("_ckd")).cast("long").alias("xg"),
        (F.col("_ys") / F.col("_dyd")).cast("long").alias("yg"),
    ).select(
        "ck",
        "dy",
        "ckrange",
        "dyrange",
        (_morton(F.col("xg"), F.col("yg")) / ((4**Z_BITS) // Z_BUCKETS))
        .cast("long")
        .alias("bucket"),
        (F.col("xg") / ((2**Z_BITS) // Z_BUCKETS)).cast("long").alias(
            "lin_bucket"
        ),
    )

    def spans(frame: DataFrame, bucket_col: str, name: str) -> DataFrame:
        per = frame.groupBy(bucket_col).agg(
            (
                (F.max("ck") - F.min("ck")).cast("double") / F.max("ckrange")
            ).alias("cks"),
            (
                (F.max("dy") - F.min("dy")).cast("double") / F.max("dyrange")
            ).alias("dys"),
        )
        return per.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            ratio(F.avg("cks")).alias("avg_cust_span"),
            ratio(F.avg("dys")).alias("avg_day_span"),
        )

    g = g.localCheckpoint()  # feeds both layout branches
    return spans(g, "bucket", "zorder").unionByName(
        spans(g, "lin_bucket", "linear")
    )


@query(
    "io_column_stats",
    oracle=f"""
    WITH s AS (SELECT * FROM orders)
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               FLOOR(MIN({c}) * 100 + 0.5) / 100 AS min_num,
               FLOOR(MAX({c}) * 100 + 0.5) / 100 AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM s''' for c in STATS_NUM_COLS)}
    UNION ALL
    {" UNION ALL ".join(
        f'''SELECT '{c}', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT {c}) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               MIN({c}), MAX({c})
        FROM s''' for c in STATS_STR_COLS)}
    """,
)
def io_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE orders: per-column row count, null count, exact
    NDV, and min/max — the statistics a cost-based optimizer's join
    reordering and a zone map's pruning both consume. Numeric min/max
    land in (min_num, max_num) on a cent grid; string columns in
    (min_str, max_str).

    Scale: ONE scan computes every non-distinct stat; the exact NDVs
    add one expand-shuffle (Spark's multi-distinct rewrite). At
    lakehouse scale swap `approx_count_distinct` (HLL, same single
    pass, no expand) — exact is kept here for oracle parity."""
    orders = cat(spark, sf_dir)["orders"]
    frames = []
    for c in STATS_NUM_COLS:
        frames.append(
            orders.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.count_distinct(F.col(c)).cast("bigint").alias("ndv"),
                (F.floor(F.min(c) * 100 + F.lit(0.5)) / 100).alias("min_num"),
                (F.floor(F.max(c) * 100 + F.lit(0.5)) / 100).alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in STATS_STR_COLS:
        frames.append(
            orders.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.count_distinct(F.col(c)).cast("bigint").alias("ndv"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.min(c).alias("min_str"),
                F.max(c).alias("max_str"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


@query(
    "io_snapshot_vacuum",
    # Real oracle: the vacuum script is data-independent except the
    # 50-row head — 3 versions collapse to 1, the two unreferenced
    # dirs delete, dropped-version time travel must raise, and disk
    # must match the manifest.
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_versions_before,
           CAST(1 AS BIGINT) AS n_versions_after,
           CAST(2 AS BIGINT) AS n_dirs_deleted,
           (SELECT CAST(LEAST(50, COUNT(*)) AS BIGINT) FROM orders)
             AS rows_at_head,
           TRUE AS old_time_travel_fails,
           TRUE AS disk_matches_manifest
    """,
)
def io_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM on the transactional snapshot table: build three versions
    (create/append/overwrite), vacuum to the last one, and audit —
    old data dirs physically deleted, still-referenced dirs kept,
    time travel to dropped versions now raises instead of reading
    dangling files. This is the retention knob every table format
    pairs with time travel (storage isn't free at 100 TB; neither is
    an unbounded manifest list).

    Scale: vacuum is O(#versions + #dirs) driver metadata + directory
    removals — zero data reads. See sources/snapshots.py:vacuum."""
    import os
    import tempfile

    import pandas as pd

    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    with tempfile.TemporaryDirectory(prefix="snapv_") as tmp:
        t = SnapshotTable(
            spark, os.path.join(tmp, "t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.limit(100))
        t.append(orders.limit(200))
        t.overwrite(orders.limit(50))
        pre_versions = t.versions()
        audit = t.vacuum(retain_last=1)
        post_versions = t.versions()
        rows_after = t.row_count()
        try:
            t.read(version=pre_versions[0])
            travel_fails = False
        except ValueError:
            travel_fails = True
        live_dirs = {
            e["dir"] for e in t.history()[-1]["entries"]
        }
        dirs_on_disk = set()
        data_root = os.path.join(tmp, "t", "data")
        for d in os.listdir(data_root):
            dirs_on_disk.add(f"data/{d}")
        row = {
            "n_versions_before": len(pre_versions),
            "n_versions_after": len(post_versions),
            "n_dirs_deleted": len(audit["deleted_dirs"]),
            "rows_at_head": rows_after,
            "old_time_travel_fails": travel_fails,
            "disk_matches_manifest": dirs_on_disk == live_dirs,
        }
    return spark.createDataFrame(
        pd.DataFrame([row]),
        "n_versions_before bigint, n_versions_after bigint, "
        "n_dirs_deleted bigint, rows_at_head bigint, "
        "old_time_travel_fails boolean, disk_matches_manifest boolean",
    )


@query(
    "io_partition_skew_audit",
    oracle=f"""
    WITH k AS (SELECT {SKEW_KEY} AS key, CAST(COUNT(*) AS BIGINT) AS c
               FROM lineitem GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           FLOOR(AVG(c) * 10000 + 0.5) / 10000 AS avg_rows,
           FLOOR(quantile_cont(c, 0.5) * 10000 + 0.5) / 10000 AS p50_rows,
           FLOOR(quantile_cont(c, 0.95) * 10000 + 0.5) / 10000 AS p95_rows,
           CAST(MAX(c) AS BIGINT) AS max_rows,
           FLOOR(MAX(c) / AVG(c) * 10000 + 0.5) / 10000 AS skew_ratio
    FROM k
    """,
)
def io_partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-per-key profile of the `{SKEW_KEY}` join key: count
    distribution (avg/p50/p95/max) and skew_ratio = max/avg — the
    audit run BEFORE a big join to decide: ratio ≈ 1 → plain shuffle
    join; moderate → AQE skew-join split; extreme → explicit salting
    (`functions/skew.py`, used by j_skew_salted). Exact percentiles
    keep oracle parity; both engines interpolate identically on the
    sorted counts.

    Scale: per-key counts partial-agg map-side to |keys| rows; the
    profile is one aggregate over that. At extreme |keys| swap the
    exact percentile for approx_percentile (same sketch as
    w_ntile_approx) — noted, not needed for the audit's decision."""
    li = cat(spark, sf_dir)["lineitem"]
    k = li.groupBy(F.col(SKEW_KEY).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        ratio(F.avg("c")).alias("avg_rows"),
        ratio(F.percentile("c", F.lit(0.5))).alias("p50_rows"),
        ratio(F.percentile("c", F.lit(0.95))).alias("p95_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        ratio(F.max("c") / F.avg("c")).alias("skew_ratio"),
    )
