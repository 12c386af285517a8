"""Wave 117: relative-error quantile sketching, position-based
attribution, and file-reader option surface.

sketch_ddsketch is the DDSketch idea made fully oracle-checkable:
log-spaced buckets give quantile estimates with a GUARANTEED relative
error (α from γ), mergeable by bucket-count addition — the sketch
SREs use for latency percentiles because 1% relative error at P99 is
meaningful where rank error is not; ev_position_attribution is
U-shaped multi-touch credit (40/20/40 first/middle/last) per journey
— completing the repo's attribution family (linear,
Markov, Shapley); io_read_options_surface pins pathGlobFilter /
recursiveFileLookup semantics on a nested directory tree.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DD_GAMMA = 1.02  # relative accuracy alpha = (g-1)/(g+1) ~ 1%
DD_QS = (0.5, 0.9, 0.99)
POS_FIRST, POS_LAST = 0.4, 0.4


def _dd_lg() -> float:
    return math.log(DD_GAMMA)


@query(
    "sketch_ddsketch",
    oracle=f"""
    WITH b AS (SELECT CAST(FLOOR(LN(o_totalprice) / {_dd_lg()!r}) AS BIGINT)
                 AS bk,
                      CAST(COUNT(*) AS DOUBLE) AS c
               FROM orders WHERE o_totalprice > 0 GROUP BY 1),
    t AS (SELECT SUM(c) AS n FROM b),
    e AS (SELECT bk, SUM(c) OVER (ORDER BY bk) AS cum FROM b),
    q AS (SELECT v.q,
                 (SELECT MIN(bk) FROM e, t WHERE cum >= CEIL(v.q * t.n))
                   AS qbk
          FROM (VALUES {", ".join(f"({q})" for q in DD_QS)}) v(q)),
    ex AS (SELECT v.q,
                  (SELECT MIN(x.o_totalprice) FROM (
                     SELECT o_totalprice,
                            ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
                     FROM orders WHERE o_totalprice > 0) x, t
                   WHERE x.rn >= CEIL(v.q * t.n)) AS exact
           FROM (VALUES {", ".join(f"({q})" for q in DD_QS)}) v(q), t)
    SELECT FLOOR(q.q * 100 + 0.5) / 100 AS q,
           FLOOR(POW({DD_GAMMA}, q.qbk) * (2.0 / (1 + 1.0 / {DD_GAMMA}))
                 * 100 + 0.5) / 100 AS dd_estimate,
           FLOOR(ex.exact * 100 + 0.5) / 100 AS exact,
           FLOOR(ABS(POW({DD_GAMMA}, q.qbk) * (2.0 / (1 + 1.0 / {DD_GAMMA}))
                     - ex.exact) / ex.exact * 10000 + 0.5) / 10000
             AS rel_error
    FROM q JOIN ex ON q.q = ex.q
    """,
)
def sketch_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantiles of order totalprice (γ = {g}, so relative
    error ≤ (γ−1)/(γ+1) ≈ 1%): values land in log-spaced buckets
    ⌊ln x/ln γ⌋, the quantile is read from cumulative bucket counts,
    and the estimate is the bucket's geometric midpoint. The exact
    quantile rides along with the measured relative error — which
    must sit inside the guarantee (pinned in pytest). Mergeable by
    bucket addition, bounded memory at ANY cardinality — the latency-
    percentile sketch.

    Scale: the bucket rollup is one shuffle to O(log-range/log γ)
    rows; the readout is a tiny prefix scan. (Exact side for the
    audit only.)"""
    orders = cat(spark, sf_dir)["orders"].filter(F.col("o_totalprice") > 0)
    lg = _dd_lg()
    b = orders.groupBy(
        F.floor(F.log("o_totalprice") / lg).cast("bigint").alias("bk")
    ).agg(F.count(F.lit(1)).cast("double").alias("c")).localCheckpoint()
    t = b.agg(F.sum("c").alias("n"))
    w = W.orderBy("bk").rowsBetween(W.unboundedPreceding, 0)
    e = b.withColumn("cum", F.sum("c").over(w))  # |buckets| rows: tiny frame
    qs = spark.createDataFrame([(q,) for q in DD_QS], "q double")
    qb = (
        e.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(F.min("bk").alias("qbk"))
    )
    # exact quantiles via the two-phase rank pattern (distinct values)
    from mister_spark.functions.ranks import bucketed_cumsum

    g = orders.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    ec = bucketed_cumsum(g, "v", {"cum": F.col("c")})
    ex = (
        ec.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(F.col("q").alias("q2"))
        .agg(F.min("v").alias("exact"))
    )
    mid = F.pow(F.lit(DD_GAMMA), F.col("qbk")) * (
        2.0 / (1 + 1.0 / DD_GAMMA)
    )
    return (
        qb.join(ex, qb.q == ex.q2)
        .select(
            (F.floor(F.col("q") * 100 + 0.5) / 100).alias("q"),
            (F.floor(mid * 100 + 0.5) / 100).alias("dd_estimate"),
            (F.floor(F.col("exact") * 100 + 0.5) / 100).alias("exact"),
            ratio(F.abs(mid - F.col("exact")) / F.col("exact")).alias(
                "rel_error"
            ),
        )
    )


sketch_ddsketch.__doc__ = sketch_ddsketch.__doc__.format(g=DD_GAMMA)


@query(
    "ev_position_attribution",
    oracle=f"""
    WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events WHERE event_type <> 'purchase'),
    conv AS (SELECT user_id, MIN(epoch_us(ts)) AS conv_t
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
    touch AS (SELECT s.user_id, s.event_type, s.tus,
                     ROW_NUMBER() OVER (PARTITION BY s.user_id
                                        ORDER BY s.tus, s.event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY s.user_id) AS m
              FROM s JOIN conv ON s.user_id = conv.user_id
              WHERE s.tus < conv.conv_t),
    t2 AS (SELECT user_id, event_type, rn,
                  COUNT(*) OVER (PARTITION BY user_id) AS m
           FROM touch),
    w AS (SELECT event_type,
                 CASE WHEN m = 1 THEN 1.0
                      WHEN rn = 1 THEN {POS_FIRST}
                      WHEN rn = m THEN {POS_LAST}
                      ELSE (1.0 - {POS_FIRST} - {POS_LAST}) / (m - 2)
                 END AS credit
          FROM t2)
    SELECT event_type,
           FLOOR(SUM(credit) * 10000 + 0.5) / 10000 AS credit,
           CAST(COUNT(*) AS BIGINT) AS touches
    FROM w GROUP BY 1
    """,
)
def ev_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: touches
    before a user's first purchase earn {f:.0%} for the first touch,
    {l:.0%} for the last, and the middle shares the rest equally —
    the rule marketing uses when first discovery and final nudge both
    matter. Completes the attribution family next to linear, Markov
    removal-effect, and Shapley.

    Scale: the journey windows partition by user (sessionize
    exchange); credit is per-row arithmetic; the rollup is
    |types|-sized. NOTE: the touch count m is recomputed AFTER the
    pre-conversion filter so credits sum to 1 per converting user."""
    ev = cat(spark, sf_dir)["events"]
    s = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("conv_t"))
    )
    touch = (
        s.join(conv, "user_id")
        .filter(F.col("tus") < F.col("conv_t"))
    )
    wp = W.partitionBy("user_id").orderBy("tus", "event_id")
    t2 = touch.select(
        "user_id",
        "event_type",
        F.row_number().over(wp).alias("rn"),
    ).withColumn(
        "m", F.count(F.lit(1)).over(W.partitionBy("user_id"))
    )
    mid_share = (1.0 - POS_FIRST - POS_LAST)
    credit = (
        F.when(F.col("m") == 1, 1.0)
        .when(F.col("rn") == 1, POS_FIRST)
        .when(F.col("rn") == F.col("m"), POS_LAST)
        .otherwise(mid_share / (F.col("m") - 2))
    )
    return (
        t2.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            ratio(F.sum("credit")).alias("credit"),
            F.count(F.lit(1)).cast("bigint").alias("touches"),
        )
    )


ev_position_attribution.__doc__ = ev_position_attribution.__doc__.format(
    f=POS_FIRST, l=POS_LAST
)


@query(
    "io_read_options_surface",
    # Real oracle: the staged layout is fixed (100 rows per leaf, two
    # leaves) — a fixed relation.
    oracle="""
    SELECT CAST(100 AS BIGINT) AS rows_plain,
           CAST(200 AS BIGINT) AS rows_recursive,
           CAST(200 AS BIGINT) AS rows_glob
    """,
)
def io_read_options_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-reader option surface on a nested directory tree
    (region=a/, region=b/nested/): (1) plain read of the root fails
    to see nested non-partition dirs, (2) recursiveFileLookup=true
    sees every file, (3) pathGlobFilter prunes by file pattern at
    LISTING time — before any footer is opened. The listing-level
    levers for messy data lakes.

    Scale: listing semantics only; the written volume is
    incidental."""
    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    base = os.path.join(repo_tmp, "read_opts_demo")
    shutil.rmtree(base, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"].limit(100).localCheckpoint()
    orders.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "flat")
    )
    orders.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "flat", "nested")
    )
    n_flat = spark.read.parquet(os.path.join(base, "flat")).count()
    n_rec = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(base, "flat"))
        .count()
    )
    n_glob = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(base, "flat"))
        .count()
    )
    row = (int(n_flat), int(n_rec), int(n_glob))
    return spark.createDataFrame(
        [row], "rows_plain long, rows_recursive long, rows_glob long"
    )
