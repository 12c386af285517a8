"""Wave 29: NOT IN null semantics, rolling regression slopes,
cross-source vocabulary overlap, and zone-map (sort-clustered) pruning.

Correctness-trap SQL semantics (the NOT IN three-valued-logic footgun,
spelled out so both engines prove the same answer), trailing-window
trend estimation for monitoring, corpus-seam diagnostics between
document sources, and the stats-based row-group-skipping layout lever
that complements io_partitioned_prune's directory pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd, ts
from mister_spark.registry import query

DAY_US = 86400000000
SLOPE_DAYS = 6  # trailing window: current day + 6 preceding


@query(
    "sq_not_in_null_trap",
    oracle="""
    WITH sub AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderpriority = '1-URGENT'),
    hn AS (SELECT CAST(MAX(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS has_null FROM sub),
    ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_not_in FROM customer
           WHERE c_custkey NOT IN (SELECT k FROM sub)),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_not_exists FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey))
    SELECT hn.has_null, ni.n_not_in, ne.n_not_exists FROM hn, ni, ne
    """,
)
def sq_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, proven identical on both
    engines: against a subquery whose key set contains a NULL (urgent
    orders, custkey nulled for 'P' status), `NOT IN` can never be TRUE
    (x <> NULL is UNKNOWN), so n_not_in collapses to 0 while the
    NOT EXISTS rewrite returns the count users actually want. The
    DataFrame side spells out the semantics explicitly — an anti-join
    for NOT EXISTS, gated to zero by a has-null flag for NOT IN — which
    is exactly the rewrite Catalyst does internally (null-aware anti
    join).

    Scale: the subquery collapses to a distinct key set (one partial-agg
    shuffle); the anti-join shuffles on custkey; the null flag is a
    1-row aggregate broadcast."""
    orders = cat(spark, sf_dir)["orders"]
    cust = cat(spark, sf_dir)["customer"]
    sub = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    hn = sub.agg(
        F.max(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("has_null")
    )
    ne = cust.join(
        sub.filter(F.col("k").isNotNull()).distinct(),
        cust["c_custkey"] == F.col("k"),
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_not_exists"))
    return (
        hn.crossJoin(F.broadcast(ne))
        .select(
            "has_null",
            F.when(F.col("has_null") > 0, F.lit(0))
            .otherwise(F.col("n_not_exists"))
            .cast("bigint")
            .alias("n_not_in"),
            "n_not_exists",
        )
    )


@query(
    "ev_rolling_slope",
    oracle=f"""
    WITH dc AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
                       CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
                FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, day,
                 CAST(COUNT(*) OVER win AS BIGINT) AS n,
                 SUM(day) OVER win AS sx, SUM(vc) OVER win AS sy,
                 SUM(day * day) OVER win AS sxx, SUM(day * vc) OVER win AS sxy
          FROM dc
          WINDOW win AS (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN {SLOPE_DAYS} PRECEDING AND CURRENT ROW))
    SELECT event_type, CAST(day AS BIGINT) AS day, n AS n_days,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                THEN FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) * 10000 + 0.5)
                     / 10000
                END AS slope
    FROM w
    """,
)
def ev_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day OLS trend slope of daily revenue per event type —
    the monitoring 'is this metric drifting' estimator, computed from
    windowed moment sums (the stat_regression closed form inside a
    RANGE frame, so calendar gaps shrink n rather than stretching the
    window). All moments are exact int64 products of epoch-days and
    integer cents; one rounded division at the end.

    Scale: the daily rollup is one partial-agg shuffle; the RANGE
    windows are PARTITIONED by event_type over #days-sized frames —
    the event-sized table never enters a window."""
    ev = cat(spark, sf_dir)["events"]
    dc = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
    )
    win = (
        W.partitionBy("event_type").orderBy("day").rangeBetween(-SLOPE_DAYS, 0)
    )
    w = dc.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("day").over(win).alias("sx"),
        F.sum("vc").over(win).alias("sy"),
        F.sum(F.col("day") * F.col("day")).over(win).alias("sxx"),
        F.sum(F.col("day") * F.col("vc")).over(win).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    var_x = n * F.col("sxx") - sx * sx
    cov = n * F.col("sxy") - sx * sy
    return w.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("n").alias("n_days"),
        F.when(
            (n >= 2) & (var_x > 0),
            ratio(cov.cast("double") / var_x.cast("double")),
        ).alias("slope"),
    )


@query(
    "tx_source_vocab_overlap",
    oracle=f"""
    WITH st AS (SELECT DISTINCT source, unnest({DUCK_TOKENS}) AS tk
                FROM documents),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
    pr AS (SELECT a.source AS source_a, b.source AS source_b,
                  CAST(COUNT(*) AS BIGINT) AS inter
           FROM st a JOIN st b ON a.tk = b.tk AND a.source < b.source
           GROUP BY 1, 2)
    SELECT pr.source_a, pr.source_b, sa.n AS vocab_a, sb.n AS vocab_b,
           pr.inter,
           FLOOR(CAST(pr.inter AS DOUBLE) / (sa.n + sb.n - pr.inter)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM pr JOIN sz sa ON pr.source_a = sa.source
            JOIN sz sb ON pr.source_b = sb.source
    """,
)
def tx_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between document sources — the
    corpus-seam diagnostic (two crawl slices with near-identical
    vocabularies are probably the same underlying source; near-disjoint
    ones shift the token distribution when mixed). Intersections come
    from the token-keyed self-join of the distinct (source, token)
    index: per token the fan-out is bounded by #sources², never
    corpus-sized.

    Scale: one distinct shuffle to build the index (vocabulary × source
    sized), one token-keyed join; sizes broadcast. The index is
    checkpointed — three branches read it."""
    docs = cat(spark, sf_dir)["documents"]
    st = (
        docs.select("source", F.explode(tokens()).alias("tk"))
        .distinct()
        .localCheckpoint()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.select(F.col("source").alias("source_a"), "tk")
    b = st.select(F.col("source").alias("source_b"), "tk")
    pr = (
        a.join(b, "tk")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        pr.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "inter",
            ratio(
                F.col("inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


@query(
    "io_zone_map_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1998-02-01'
    """,
)
def io_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """January-1998 revenue read from a shipdate-RANGE-CLUSTERED rewrite
    of lineitem (stage_sorted_lineitem): because each row group covers a
    narrow shipdate band, the range predicate is answered mostly from
    parquet footer min/max stats — row groups outside the band are never
    decompressed. This is the clustering complement to
    io_partitioned_prune (directory pruning needs a low-cardinality
    key; date-range hot filters want sort clustering / Z-order). The
    filter reaches the scan as PushedFilters (pinned in
    tests/test_wave29.py); the oracle runs the same query over the
    unclustered original, proving the layout is storage-only.

    Scale: at 100 TB the clustered rewrite is one range shuffle paid at
    write time; every shipdate-band query after it reads ~band/range of
    the row groups instead of the full fact table."""
    from mister_spark.sources.staged import stage_sorted_lineitem

    path = stage_sorted_lineitem(spark, sf_dir)
    li = spark.read.parquet(path)
    return li.filter(
        (F.col("l_shipdate") >= ts("1998-01-01"))
        & (F.col("l_shipdate") < ts("1998-02-01"))
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )
