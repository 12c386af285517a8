"""Wave 143: regexp surface parity and cache-storage observability.

sql_regexp_suite exercises the regexp expression family
(regexp_count / regexp_extract / regexp_replace) against DuckDB's
regex engine on the same patterns — cross-engine regex semantics are
a classic silent-divergence source, and this op PINS the shared
subset; io_cache_storage_audit caches a frame and reads back the
storage registry (blocks, memory bytes) — making 'is it actually
cached, and how big' a queryable fact instead of a UI screenshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "sql_regexp_suite",
    oracle="""
    WITH t AS (SELECT text FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(len(regexp_extract_all(text, 'the'))) AS BIGINT)
             AS the_matches,
           CAST(SUM(CASE WHEN regexp_matches(text, '^the ') THEN 1
                    ELSE 0 END) AS BIGINT) AS starts_with_the,
           CAST(SUM(len(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT)
             AS devoweled_chars,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT)
             AS word_matches
    FROM t
    """,
)
def sql_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface parity: literal counting, anchored matching,
    global character-class replacement, and token extraction — the
    same four patterns evaluated by Spark's regex (Java) and DuckDB's
    (RE2-style), byte-for-byte equal on this portable subset.
    Cross-engine regex drift (lazy quantifiers, anchor semantics,
    class shorthands) is a classic silent-corruption source; pinning
    the shared subset is what makes regex-bearing pipelines
    portable.

    Scale: all four are narrow JVM expressions over one scan."""
    docs = cat(spark, sf_dir)["documents"]
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(F.regexp_count("text", F.lit("the")))
        .cast("bigint")
        .alias("the_matches"),
        F.sum((F.regexp_count("text", F.lit("^the ")) > 0).cast("long"))
        .cast("bigint")
        .alias("starts_with_the"),
        F.sum(F.length(F.regexp_replace("text", "[aeiou]", "")))
        .cast("bigint")
        .alias("devoweled_chars"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)))
        .cast("bigint")
        .alias("word_matches"),
    )


@query("io_cache_storage_audit")  # storage registry → rows-only
def io_cache_storage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache-storage audit: persist the lineitem projection, force
    materialization, then read the RDD storage registry — cached
    block count, memory bytes, and the fraction of partitions
    actually resident. 'We cached it' and 'it fit in memory' are
    different claims; this op measures the second (partial caching
    under memory pressure silently recomputes the evicted tail).

    Scale: the audit reads executor-side registry metadata only."""
    li = (
        cat(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_extendedprice")
        .persist()
    )
    n = li.count()  # force materialization
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    cached_blocks = 0
    mem_bytes = 0
    frames = 0
    full_frac = 0.0
    for info in infos:
        frames += 1
        cached_blocks += info.numCachedPartitions()
        mem_bytes += info.memSize()
        if info.numPartitions() > 0:
            full_frac = max(
                full_frac,
                info.numCachedPartitions() / info.numPartitions(),
            )
    li.unpersist()
    row = (
        int(n),
        int(frames),
        int(cached_blocks),
        int(mem_bytes),
        round(full_frac, 4),
    )
    return spark.createDataFrame(
        [row],
        "rows long, cached_frames long, cached_blocks long, "
        "memory_bytes long, max_resident_fraction double",
    )
