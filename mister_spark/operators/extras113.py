"""Wave 113: table statistics for the optimizer, estimator-robustness
auditing, and near-duplicate split leakage.

sql_analyze_stats runs ANALYZE TABLE (table + column statistics) and
reads them back from the catalog — the CBO inputs that decide
broadcast vs shuffle joins, proven present rather than assumed;
stat_robustness_demo injects deterministic 1% gross corruption and
measures how far mean / trimmed mean / median drift — the breakdown
behavior that decides which location estimator a metric pipeline
should ship; ds_near_dup_leakage counts held-out documents with a
NEAR-duplicate (3-gram Jaccard) inside the training split — the
contamination mode exact-match decontamination provably misses.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.dedup import DD_NGRAM_ORACLE, dd_ngram_jaccard
from mister_spark.registry import query

CORRUPT_PCT = 1  # percent of rows corrupted
CORRUPT_FACTOR = 100.0
LEAK_SPLIT = 5  # doc_id % LEAK_SPLIT == 0 → held-out


@query("sql_analyze_stats")  # catalog statistics surface → rows-only
def sql_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE surface: register orders as an external parquet
    table, compute table statistics AND column statistics for
    (o_custkey, o_totalprice), then read them back via DESCRIBE
    EXTENDED — rowCount, sizeInBytes, and per-column distinct-count /
    null-count. These are the numbers the cost-based optimizer feeds
    on (join reordering, broadcast decisions, skew estimates); a
    catalog without them runs on guesses.

    Scale: ANALYZE is one scan (column stats use HLL sketches
    internally — mergeable, bounded memory); reading stats back is
    metadata-only."""
    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "analyze_demo", "orders")
    shutil.rmtree(os.path.dirname(loc), ignore_errors=True)
    cat(spark, sf_dir)["orders"].write.mode("overwrite").parquet(loc)
    spark.sql("DROP TABLE IF EXISTS _an_orders")
    spark.sql(
        f"CREATE TABLE _an_orders USING parquet LOCATION '{loc}'"
    )
    spark.sql("ANALYZE TABLE _an_orders COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE _an_orders COMPUTE STATISTICS "
        "FOR COLUMNS o_custkey, o_totalprice"
    )
    tbl_stats = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED _an_orders").collect()
    }
    stats_line = tbl_stats.get("Statistics", "")
    col = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(
            "DESCRIBE EXTENDED _an_orders o_custkey"
        ).collect()
    }
    n_rows = cat(spark, sf_dir)["orders"].count()
    row = (
        int(n_rows),
        int("bytes" in stats_line),
        int(str(n_rows) in stats_line),
        int(col.get("distinct_count", "0") or 0),
        int(col.get("num_nulls", "-1") or -1),
    )
    spark.sql("DROP TABLE IF EXISTS _an_orders")
    return spark.createDataFrame(
        [row],
        "table_rows long, has_size_stats long, rowcount_in_stats long, "
        "custkey_distinct long, custkey_nulls long",
    )


@query(
    "stat_robustness_demo",
    oracle=f"""
    WITH d AS (SELECT o_totalprice AS y,
                      CASE WHEN (o_orderkey * {FP_MUL} + 3) % {FP_MOD} % 100
                                < {CORRUPT_PCT}
                           THEN o_totalprice * {CORRUPT_FACTOR}
                           ELSE o_totalprice END AS yc
               FROM orders),
    q AS (SELECT quantile_cont(y, 0.5) AS med_clean,
                 quantile_cont(yc, 0.5) AS med_dirty,
                 AVG(y) AS mean_clean, AVG(yc) AS mean_dirty
          FROM d),
    t AS (SELECT AVG(y) AS t_clean FROM d, q
          WHERE y BETWEEN (SELECT quantile_cont(d2.y, 0.05) FROM d d2)
                      AND (SELECT quantile_cont(d2.y, 0.95) FROM d d2)),
    t2 AS (SELECT AVG(yc) AS t_dirty FROM d
           WHERE yc BETWEEN (SELECT quantile_cont(d2.yc, 0.05) FROM d d2)
                        AND (SELECT quantile_cont(d2.yc, 0.95) FROM d d2))
    SELECT FLOOR(ABS(q.mean_dirty - q.mean_clean) / q.mean_clean
                 * 10000 + 0.5) / 10000 AS mean_drift,
           FLOOR(ABS(t2.t_dirty - t.t_clean) / t.t_clean
                 * 10000 + 0.5) / 10000 AS trimmed_drift,
           FLOOR(ABS(q.med_dirty - q.med_clean) / q.med_clean
                 * 10000 + 0.5) / 10000 AS median_drift
    FROM q, t, t2
    """,
)
def stat_robustness_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator robustness audit: corrupt a deterministic {p}% of
    order values by ×{f} (a fat-finger/unit-bug simulation) and
    measure the relative drift of the mean, the 5–95% trimmed mean,
    and the median. The ordering mean ≫ trimmed > median ≈ 0 is the
    breakdown-point story as a number — and the reason SLO/ revenue
    metrics should never ship on raw means alone.

    Scale: corruption is a pure column expression; each estimator is
    one aggregate (quantiles via the engines' exact interpolated
    quantile on this bounded column; at 100 TB the repo's two-phase
    exact-rank quantile machinery substitutes)."""
    d = cat(spark, sf_dir)["orders"].select(
        F.col("o_totalprice").alias("y"),
        F.when(
            (F.col("o_orderkey") * FP_MUL + 3) % FP_MOD % 100 < CORRUPT_PCT,
            F.col("o_totalprice") * CORRUPT_FACTOR,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("yc"),
    ).localCheckpoint()
    q = d.agg(
        F.expr("percentile(y, 0.5)").alias("med_clean"),
        F.expr("percentile(yc, 0.5)").alias("med_dirty"),
        F.avg("y").alias("mean_clean"),
        F.avg("yc").alias("mean_dirty"),
        F.expr("percentile(y, 0.05)").alias("lo_c"),
        F.expr("percentile(y, 0.95)").alias("hi_c"),
        F.expr("percentile(yc, 0.05)").alias("lo_d"),
        F.expr("percentile(yc, 0.95)").alias("hi_d"),
    )
    j = d.crossJoin(F.broadcast(q))
    t = j.agg(
        F.avg(
            F.when(
                (F.col("y") >= F.col("lo_c")) & (F.col("y") <= F.col("hi_c")),
                F.col("y"),
            )
        ).alias("t_clean"),
        F.avg(
            F.when(
                (F.col("yc") >= F.col("lo_d"))
                & (F.col("yc") <= F.col("hi_d")),
                F.col("yc"),
            )
        ).alias("t_dirty"),
        F.first("mean_clean").alias("mean_clean"),
        F.first("mean_dirty").alias("mean_dirty"),
        F.first("med_clean").alias("med_clean"),
        F.first("med_dirty").alias("med_dirty"),
    )
    return t.select(
        ratio(
            F.abs(F.col("mean_dirty") - F.col("mean_clean"))
            / F.col("mean_clean")
        ).alias("mean_drift"),
        ratio(
            F.abs(F.col("t_dirty") - F.col("t_clean")) / F.col("t_clean")
        ).alias("trimmed_drift"),
        ratio(
            F.abs(F.col("med_dirty") - F.col("med_clean"))
            / F.col("med_clean")
        ).alias("median_drift"),
    )


stat_robustness_demo.__doc__ = stat_robustness_demo.__doc__.format(
    p=CORRUPT_PCT, f=CORRUPT_FACTOR
)


@query(
    "ds_near_dup_leakage",
    oracle=f"""
    WITH pairs AS ({DD_NGRAM_ORACLE}),
    xp AS (SELECT doc_a, doc_b FROM pairs
           WHERE (doc_a % {LEAK_SPLIT} = 0) <> (doc_b % {LEAK_SPLIT} = 0)),
    leaked AS (SELECT DISTINCT CASE WHEN doc_a % {LEAK_SPLIT} = 0
                                    THEN doc_a ELSE doc_b END AS test_doc
               FROM xp),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_test FROM documents
          WHERE doc_id % {LEAK_SPLIT} = 0)
    SELECT CAST(t.n_test AS BIGINT) AS test_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM leaked) AS leaked_docs,
           FLOOR((SELECT COUNT(*) FROM leaked) / t.n_test * 10000 + 0.5)
             / 10000 AS leak_rate
    FROM t
    """,
)
def ds_near_dup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate split leakage: held-out documents
    (doc_id % {s} == 0) that have a ≥-threshold 3-gram-Jaccard
    near-dup in the TRAINING split — eval contamination that
    exact-match decontamination (ds_contamination) provably cannot
    see, and the reason near-dup dedup must run BEFORE the split, not
    after. Reports the held-out leak rate.

    Scale: reuses dd_ngram_jaccard's capped inverted-index candidate
    machinery (never all-pairs); the split check is arithmetic on the
    pair list."""
    pairs = dd_ngram_jaccard(spark, sf_dir)
    is_test_a = F.col("doc_a") % LEAK_SPLIT == 0
    is_test_b = F.col("doc_b") % LEAK_SPLIT == 0
    xp = pairs.filter(is_test_a != is_test_b)
    leaked = xp.select(
        F.when(is_test_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "test_doc"
        )
    ).distinct()
    n_test = (
        cat(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") % LEAK_SPLIT == 0)
        .count()
    )
    n_leaked = leaked.count()
    row = (
        int(n_test),
        int(n_leaked),
        round(n_leaked / n_test, 4) if n_test else 0.0,
    )
    return spark.createDataFrame(
        [row], "test_docs long, leaked_docs long, leak_rate double"
    )


ds_near_dup_leakage.__doc__ = ds_near_dup_leakage.__doc__.format(
    s=LEAK_SPLIT
)
