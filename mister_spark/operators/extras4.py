"""Relational wave 4: MapReduce secondary sort, unpivot/melt, full
outer reconciliation, per-group mode, and calendar heatmap.

Small, ubiquitous shapes that complete the surface: ordered per-key
folds (the classic MR "secondary sort"), wide→long reshaping, the
both-sides-preserved reconciliation join, deterministic mode, and the
dow×hour activity matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mister_spark.functions.ranks import global_rank, ntile_from_rank
from mister_spark.functions.text import tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query


@query(
    "mr_secondary_sort",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date,
           string_agg(o_orderkey, ',' ORDER BY o_orderdate, o_orderkey)
             AS order_seq
    FROM orders GROUP BY 1
    """,
)
def mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapReduce 'secondary sort' pattern: per key, a fold over
    values in a defined order (each customer's order ids in date order)
    — what classic MR does with composite keys + grouping comparators,
    expressed here EXACTLY as MR does: repartition on the grouping key,
    sortWithinPartitions on (key, sortkey), then a streaming
    per-partition fold (mapInPandas) that merges Arrow-batch partials.

    Scale: ONE shuffle on the grouping key; ordering uses Spark's
    external sort (spills to disk), so no aggregate buffer ever holds a
    whole key group — the round-1 sort_array(collect_list(...)) form
    buffered each group in the agg hash map, which is unbounded per-key
    memory. The fold keeps one partial row per (key, batch), merged at
    partition end; carry state is O(distinct keys in partition) = the
    size of the output itself."""
    orders = cat(spark, sf_dir)["orders"]
    rows = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            F.col("o_orderkey").cast("string").alias("ok"),
        )
        .repartition("custkey")
        .sortWithinPartitions("custkey", "d", F.col("ok").cast("long"))
    )

    def fold(batches):
        import pandas as pd

        partials = []
        for pdf in batches:
            if not len(pdf):
                continue
            # groups are contiguous (partition sorted by key): one
            # vectorized partial row per key per batch
            g = pdf.groupby("custkey", sort=False)
            partials.append(
                pd.DataFrame(
                    {
                        "custkey": g.size().index,
                        "n_orders": g.size().to_numpy(),
                        "first_date": g["d"].min().to_numpy(),
                        "last_date": g["d"].max().to_numpy(),
                        "order_seq": g["ok"].agg(",".join).to_numpy(),
                    }
                )
            )
        if not partials:
            return
        allp = pd.concat(partials, ignore_index=True)
        g = allp.groupby("custkey", sort=False)
        yield pd.DataFrame(
            {
                "custkey": g.size().index,
                "n_orders": g["n_orders"].sum().to_numpy(),
                "first_date": g["first_date"].min().to_numpy(),
                "last_date": g["last_date"].max().to_numpy(),
                "order_seq": g["order_seq"].agg(",".join).to_numpy(),
            }
        )

    return rows.mapInPandas(
        fold,
        "custkey long, n_orders long, first_date string, "
        "last_date string, order_seq string",
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH w AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                      CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS views,
                      CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS clicks,
                      CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
                        AS purchases
               FROM events GROUP BY 1)
    SELECT day, 'views' AS metric, views AS n FROM w
    UNION ALL SELECT day, 'clicks', clicks FROM w
    UNION ALL SELECT day, 'purchases', purchases FROM w
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): a conditional-aggregate wide table
    (one column per metric) unpivoted back to (day, metric, value)
    rows via DataFrame.unpivot — the inverse of agg_pivot.

    Scale: unpivot is a zero-shuffle map-side explode (k output rows
    per input row); the only shuffle is the upstream day aggregate."""
    ev = cat(spark, sf_dir)["events"]
    w = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    return w.unpivot("day", ["views", "clicks", "purchases"], "metric", "n")


@query(
    "j_full_outer",
    oracle="""
    WITH dim AS (SELECT c_custkey, FLOOR(c_acctbal * 100 + 0.5) / 100 AS bal
                 FROM customer WHERE c_acctbal > 9000),
    fact AS (SELECT o_custkey, FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             GROUP BY 1)
    SELECT CAST(COALESCE(dim.c_custkey, fact.o_custkey) AS BIGINT) AS custkey,
           CAST(dim.c_custkey IS NOT NULL AS BIGINT) AS in_dim,
           CAST(fact.o_custkey IS NOT NULL AS BIGINT) AS in_fact,
           COALESCE(dim.bal, 0.0) AS bal,
           COALESCE(fact.total, 0.0) AS total
    FROM dim FULL OUTER JOIN fact ON dim.c_custkey = fact.o_custkey
    """,
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: high-balance customers vs customers
    with 1998 order volume, preserving unmatched rows on BOTH sides
    with presence flags — the audit/diff join (which dim rows have no
    activity, which activity has no dim row).

    Scale: full outer forces a shuffle join (no broadcast path
    preserves both unmatched sides); both inputs are pre-filtered and
    pre-aggregated so the shuffle carries reduced keys only, and AQE
    handles any residual skew."""
    c = cat(spark, sf_dir)
    dim = (
        c["customer"]
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", money(F.col("c_acctbal")).alias("bal"))
    )
    fact = (
        c["orders"]
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(money(F.sum("o_totalprice")).alias("total"))
    )
    j = dim.join(fact, dim.c_custkey == fact.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").cast("bigint").alias("custkey"),
        F.col("c_custkey").isNotNull().cast("bigint").alias("in_dim"),
        F.col("o_custkey").isNotNull().cast("bigint").alias("in_fact"),
        F.coalesce("bal", F.lit(0.0)).alias("bal"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


@query(
    "stat_mode",
    oracle="""
    WITH c AS (SELECT o_orderstatus, o_orderpriority,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY 1, 2)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM
      (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY n DESC, o_orderpriority) AS rk
       FROM c) WHERE rk = 1
    """,
)
def stat_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent order priority per status) with a
    deterministic lexicographic tiebreak — built as count + top-1
    window rather than an engine mode() aggregate, whose tie behavior
    is engine-defined.

    Scale: the count collapses to |status × priority| rows before the
    window, so the rank runs on a dimension-sized frame."""
    orders = cat(spark, sf_dir)["orders"]
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@query(
    "ev_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS total
    FROM events GROUP BY 1, 2
    """,
)
def ev_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event count and value by ISO day-of-week ×
    hour — the usage-pattern matrix behind every ops dashboard. Spark's
    dayofweek is Sunday=1, so it is remapped to ISO (Mon=1..Sun=7) to
    match DuckDB's isodow.

    Scale: pure partial-aggregable groupBy on a 7×24-key space — the
    shuffle moves at most 168 rows per map task."""
    ev = cat(spark, sf_dir)["events"]
    iso = ((F.dayofweek("ts") + 5) % 7) + 1
    return ev.groupBy(
        iso.cast("bigint").alias("dow"), F.hour("ts").cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        money(F.sum("value")).alias("total"),
    )


@query(
    "ev_rollup_reuse",
    oracle="""
    WITH hourly AS (SELECT date_trunc('hour', ts) AS h, event_type,
                           CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS cents
                    FROM events GROUP BY 1, 2)
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           SUM(cents) / 100.0 AS total
    FROM hourly GROUP BY 1, 2
    """,
)
def ev_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (hypertable-style) rollup reuse: daily totals
    computed FROM the hourly rollup rather than the raw stream —
    the continuous-aggregate pattern (TimescaleDB/Druid): maintain the
    finest rollup incrementally, derive coarser grains from it. Hourly
    sums are kept as integer cents so the re-aggregation is
    order-independent and exact at any level.

    Scale: the daily query touches |hours × types| rows instead of the
    raw fact table — at 100 TB that's the difference between a scan
    and a lookup. The hourly rollup itself is one partial-agg shuffle
    and is exactly what stream_tumbling maintains incrementally; both
    levels share grouping keys, so AQE coalesces the second exchange
    into a near-no-op."""
    ev = cat(spark, sf_dir)["events"]
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n").cast("bigint").alias("n"),
        (F.sum("cents") / 100.0).alias("total"),
    )


def _ntile_approx_oracle() -> str:
    from mister_spark.functions.qsketch import (
        qs_oracle_pick,
        qs_oracle_rank,
        qs_oracle_sample,
    )

    picks = ", ".join(
        f"{qs_oracle_pick(i / 10.0, 'spend')} AS b{i}" for i in range(1, 10)
    )
    below = " + ".join(
        f"(CASE WHEN s.spend > bounds.b{i} THEN 1 ELSE 0 END)"
        for i in range(1, 10)
    )
    return f"""
    WITH spend AS (SELECT o_custkey AS custkey,
                          FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100
                            AS spend
                   FROM orders GROUP BY 1),
    {qs_oracle_sample("spend", "", "custkey")},
    {qs_oracle_rank("", "spend")},
    bounds AS (SELECT {picks} FROM qs_r)
    SELECT s.custkey, s.spend,
           CAST(10 - ({below}) AS BIGINT) AS decile
    FROM spend s CROSS JOIN bounds
    """


@query("w_ntile_approx", oracle=_ntile_approx_oracle())
def w_ntile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles via sampled boundaries — the documented
    scale path for w_ntile_deciles. Instead of one global sorted
    window (single-partition at 100 TB), compute the 9 decile
    boundaries exactly on a deterministic ~1k md5-60 hash sample
    (functions/qsketch.py — round-10 conversion from the engine-local
    t-digest, so the boundary derivation now replays bit-for-bit in
    the DuckDB oracle), broadcast the 9 numbers, and bucket each row
    map-side: full parallelism, no global sort, at the cost of
    approximate tile edges (pytest pins ≤1 decile drift and ≥80%
    exact agreement vs the exact window).

    Scale: one partial-agg shuffle for spend, one grouped-count
    broadcast + a window over the ~1k-row sample for the boundaries,
    zero shuffles for the bucketing itself."""
    from mister_spark.functions.qsketch import qs_quantiles, qs_sample

    orders = cat(spark, sf_dir)["orders"]
    s = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        rnd(F.sum("o_totalprice"), 2).alias("spend")
    ).localCheckpoint()  # feeds both the sample and the final bucketing
    sample = qs_sample(s, [], F.col("custkey"))
    bounds = qs_quantiles(
        sample, [], "spend", {f"b{i}": i / 10.0 for i in range(1, 10)}
    )
    below = sum(
        (
            F.when(F.col("spend") > F.col(f"b{i}"), 1).otherwise(0)
            for i in range(1, 10)
        ),
        start=F.lit(0),
    )
    return s.crossJoin(F.broadcast(bounds)).select(
        "custkey",
        "spend",
        (F.lit(10) - below).cast("bigint").alias("decile"),
    )


_PROFILE_COLS = [
    # (name, portable expression producing a string-typed value)
    ("o_orderkey", "CAST(o_orderkey AS STRING)"),
    ("o_custkey", "CAST(o_custkey AS STRING)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice_cents", "CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)"),
    ("o_orderpriority", "o_orderpriority"),
]


@query(
    "stat_profile",
    oracle="""
    WITH s AS (SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
                      CAST(o_custkey AS VARCHAR) AS o_custkey,
                      o_orderstatus,
                      CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS VARCHAR) AS o_totalprice_cents,
                      o_orderpriority
               FROM orders)
    SELECT 'o_orderkey' AS col, CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           MIN(o_orderkey) AS min_v, MAX(o_orderkey) AS max_v FROM s
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           MIN(o_custkey), MAX(o_custkey) FROM s
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus) FROM s
    UNION ALL
    SELECT 'o_totalprice_cents', CAST(COUNT(*) - COUNT(o_totalprice_cents) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice_cents) AS BIGINT),
           MIN(o_totalprice_cents), MAX(o_totalprice_cents) FROM s
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority) FROM s
    """,
)
def stat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler (df.summary()-style, but deterministic and
    cross-engine): per column — null count, distinct count, min, max,
    all as strings so heterogeneous columns stack into one long frame.
    Numeric min/max are profiled on integer cents to dodge
    engine-specific float-to-string formatting.

    Scale: ONE pass over the table computing every column's aggregates
    together (5 columns × 4 aggs in a single partial-aggregable agg),
    then a map-side unpivot of the 1-row result — never k scans for k
    columns. COUNT(DISTINCT) multi-column rewrites to expand; for very
    wide tables swap in approx_count_distinct (one pass, no expand)."""
    orders = cat(spark, sf_dir)["orders"]
    s = orders.selectExpr(*[f"{expr} AS {name}" for name, expr in _PROFILE_COLS])
    aggs = []
    for name, _ in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).cast("bigint").alias(f"{name}__nulls"),
            F.countDistinct(name).cast("bigint").alias(f"{name}__distinct"),
            F.min(name).alias(f"{name}__min"),
            F.max(name).alias(f"{name}__max"),
        ]
    wide = s.agg(*aggs)
    parts = [
        wide.select(
            F.lit(name).alias("col"),
            F.col(f"{name}__nulls").alias("n_nulls"),
            F.col(f"{name}__distinct").alias("n_distinct"),
            F.col(f"{name}__min").alias("min_v"),
            F.col(f"{name}__max").alias("max_v"),
        )
        for name, _ in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "mr_cogroup",
    oracle="""
    WITH o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
                      FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS spend
               FROM orders GROUP BY 1),
    e AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
                 FLOOR(SUM(value) * 100 + 0.5) / 100 AS ev_value
          FROM events GROUP BY 1)
    SELECT CAST(COALESCE(o.k, e.k) AS BIGINT) AS key,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(o.spend, 0.0) AS spend,
           CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(e.ev_value, 0.0) AS ev_value
    FROM o FULL OUTER JOIN e ON o.k = e.k
    """,
)
def mr_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapReduce cogroup primitive: two keyed sources (orders by
    customer, events by user) reduced independently, then aligned
    per key with both sides' groups present — zeros where a source has
    no rows for the key. RDD cogroup re-expressed as
    aggregate-then-full-outer, which is both leaner (groups collapse
    BEFORE the join) and AQE-optimizable.

    Scale: each source partial-aggregates to its key space before the
    join, so the full-outer shuffle carries one row per key per source
    — never the raw fact rows. With both aggs sharing the same key,
    the join reuses their shuffle partitioning (zero extra exchange)."""
    c = cat(spark, sf_dir)
    o = c["orders"].groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("spend"),
    )
    e = c["events"].groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        money(F.sum("value")).alias("ev_value"),
    )
    j = o.join(e, o.k == e.k, "full_outer")
    return j.select(
        F.coalesce(o.k, e.k).cast("bigint").alias("key"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("ev_value", F.lit(0.0)).alias("ev_value"),
    )


@query(
    "mm_text_embed_join",
    oracle="""
    WITH t AS (SELECT doc_id, lang,
                      CAST(len(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS BIGINT) AS n_tokens
               FROM documents),
    e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                 CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings)
    SELECT t.doc_id, t.lang, t.n_tokens, e.label,
           FLOOR(sqrt(list_dot_product(e.v, e.v)) * 10000 + 0.5) / 10000
             AS l2_norm
    FROM t JOIN e ON t.doc_id = e.vec_id
    """,
)
def mm_text_embed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal alignment join: the text table and its embedding
    table joined on id, emitting per-document text stats alongside
    vector stats — the shape of every text+vector curation step (and
    of image/audio tables joined to their feature columns).

    Scale: both sides are keyed by the same id; co-partitioned (or
    bucketed, sources/bucketed.py) storage makes this a zero-exchange
    merge. Norms are codegen array folds — the vectors never leave the
    JVM."""
    from mister_spark.functions.vectors import norm as _norm

    c = cat(spark, sf_dir)
    t = c["documents"].select(
        "doc_id", "lang", F.size(tokens()).cast("bigint").alias("n_tokens")
    )
    e = c["embeddings"].select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return t.join(e, t.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_tokens", "label", ratio(_norm(F.col("v"))).alias("l2_norm")
    )


def _rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer (recency_days, frequency, monetary) rollup shared by
    the exact and approx RFM paths — one orders shuffle."""
    orders = cat(spark, sf_dir)["orders"]
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("mxd"), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            money(F.sum("o_totalprice")).alias("monetary"),
        )
    )


@query(
    "ev_rfm",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    base AS (SELECT o_custkey AS custkey,
                    CAST(date_diff('day', MAX(o_orderdate), ANY_VALUE(mx.mxd))
                         AS BIGINT) AS recency_days,
                    CAST(COUNT(*) AS BIGINT) AS frequency,
                    FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS monetary
             FROM orders, mx GROUP BY 1),
    sc AS (SELECT *,
                  CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS BIGINT)
                    AS r_score,
                  CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS BIGINT)
                    AS f_score,
                  CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS BIGINT)
                    AS m_score
           FROM base)
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM sc
    """,
)
def ev_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation: each
    customer scored 1-5 on each axis by ntile quintile (1 = most
    recent / most frequent / highest spend; custkey tiebreaks make the
    cuts deterministic), concatenated into the classic 'RFM cell'
    marketing segment.

    Scale: the base aggregate is one shuffle; each ntile is the
    two-phase `global_rank` (range-partitioned sort — never a global
    sorted window) with exact NTILE(5) reconstructed arithmetically
    from (rank, n) by `ntile_from_rank`. localCheckpoints between the
    three axes keep each range shuffle from replaying the previous
    ones; the approx-boundary scale twin is ev_rfm_approx."""
    base = _rfm_base(spark, sf_dir).localCheckpoint()
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    n = F.col("_n")
    s1 = global_rank(
        base.crossJoin(F.broadcast(n_row)),
        "recency_days",
        "custkey",
        rank_col="_rk",
    ).withColumn("r_score", ntile_from_rank(F.col("_rk"), n, 5))
    s2 = global_rank(
        s1.drop("_rk").localCheckpoint(),
        F.desc("frequency"),
        F.asc("custkey"),
        rank_col="_rk",
    ).withColumn("f_score", ntile_from_rank(F.col("_rk"), n, 5))
    sc = global_rank(
        s2.drop("_rk").localCheckpoint(),
        F.desc("monetary"),
        F.asc("custkey"),
        rank_col="_rk",
    ).withColumn("m_score", ntile_from_rank(F.col("_rk"), n, 5))
    return sc.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


def _rfm_approx_oracle() -> str:
    from mister_spark.functions.qsketch import (
        qs_oracle_pick,
        qs_oracle_sample,
    )

    def axis_rank(n: int, col: str) -> str:
        return f"""
    qs_r{n} AS (SELECT *, ROW_NUMBER() OVER (ORDER BY {col}, _qh) AS _qrn,
                       CAST(COUNT(*) OVER () AS BIGINT) AS _qm
                FROM qs_s)"""

    def axis_bounds(n: int, col: str, prefix: str) -> str:
        picks = ", ".join(
            f"{qs_oracle_pick(i / 5.0, col)} AS {prefix}{i}"
            for i in range(1, 5)
        )
        return f"b{n} AS (SELECT {picks} FROM qs_r{n})"

    def below(col: str, prefix: str) -> str:
        return " + ".join(
            f"(CASE WHEN base.{col} > {prefix}{i} THEN 1 ELSE 0 END)"
            for i in range(1, 5)
        )

    return f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    base AS (SELECT o_custkey AS custkey,
                    CAST(date_diff('day', MAX(o_orderdate), ANY_VALUE(mx.mxd))
                         AS BIGINT) AS recency_days,
                    CAST(COUNT(*) AS BIGINT) AS frequency,
                    FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS monetary
             FROM orders, mx GROUP BY 1),
    {qs_oracle_sample("base", "", "custkey")},
    {axis_rank(1, "recency_days")},
    {axis_rank(2, "frequency")},
    {axis_rank(3, "monetary")},
    {axis_bounds(1, "recency_days", "br")},
    {axis_bounds(2, "frequency", "bf")},
    {axis_bounds(3, "monetary", "bm")},
    sc AS (SELECT base.custkey, base.recency_days, base.frequency,
                  base.monetary,
                  CAST(1 + {below("recency_days", "br")} AS BIGINT)
                    AS r_score,
                  CAST(5 - ({below("frequency", "bf")}) AS BIGINT)
                    AS f_score,
                  CAST(5 - ({below("monetary", "bm")}) AS BIGINT)
                    AS m_score
           FROM base CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3)
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM sc
    """


@query("ev_rfm_approx", oracle=_rfm_approx_oracle())
def ev_rfm_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation, the w_ntile_approx-style scale path: instead
    of three exact global ranks, derive the 4 quintile boundaries of
    each axis exactly on ONE deterministic ~1k md5-60 hash sample
    (functions/qsketch.py — round-10 conversion from the engine-local
    t-digest, so boundary derivation replays bit-for-bit in the DuckDB
    oracle), broadcast the 12 numbers, and score every customer
    map-side by counting boundaries below its value. Tile edges are
    approximate (pytest pins ≤1-quintile drift per axis and ≥80%
    all-three-axes agreement vs exact ev_rfm); everything after the
    base rollup is sort-free beyond the ~1k-row sample windows.

    Scale: one orders shuffle for the rollup, one grouped-count
    broadcast + three sample windows for the bounds, zero shuffles for
    the scoring."""
    from mister_spark.functions.qsketch import qs_quantiles, qs_sample

    base = _rfm_base(spark, sf_dir).localCheckpoint()
    sample = qs_sample(base, [], F.col("custkey")).localCheckpoint()
    fr = {i: i / 5.0 for i in range(1, 5)}
    b_r = qs_quantiles(
        sample, [], "recency_days", {f"br{i}": q for i, q in fr.items()}
    )
    b_f = qs_quantiles(
        sample, [], "frequency", {f"bf{i}": q for i, q in fr.items()}
    )
    b_m = qs_quantiles(
        sample, [], "monetary", {f"bm{i}": q for i, q in fr.items()}
    )

    def below(col: str, prefix: str):
        return sum(
            (
                F.when(F.col(col) > F.col(f"{prefix}{i}"), 1).otherwise(0)
                for i in range(1, 5)
            ),
            start=F.lit(0),
        )

    sc = (
        base.crossJoin(F.broadcast(b_r))
        .crossJoin(F.broadcast(b_f))
        .crossJoin(F.broadcast(b_m))
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            # recency ascending (1 = most recent); freq/monetary descending
            (1 + below("recency_days", "br")).cast("bigint").alias("r_score"),
            (5 - below("frequency", "bf")).cast("bigint").alias("f_score"),
            (5 - below("monetary", "bm")).cast("bigint").alias("m_score"),
        )
    )
    return sc.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@query(
    "cdc_latest",
    oracle="""
    SELECT user_id, event_id AS last_event_id,
           epoch_us(ts) AS last_ts_us, event_type AS last_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rk
          FROM events) WHERE rk = 1
    """,
)
def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction (SCD type-1 / latest-row-wins): collapse a
    change stream to each key's most recent record, with event_id as
    the deterministic same-timestamp tiebreak — how a change-data feed
    becomes a queryable current-state table.

    Scale: one shuffle on the key; row_number scans each key's rows
    once. For heavy keys the max_by/struct-max form (an aggregate, so
    map-side partial) is the drop-in alternative — same result, chosen
    here as the window form since rank>1 rows are also useful (history
    depth N)."""
    ev = cat(spark, sf_dir)["events"]
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("event_type").alias("last_type"),
        )
    )


@query(
    "ev_sliding_distinct",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(date_diff('day', DATE '1970-01-01',
                                     date_trunc('day', ts)) AS BIGINT) AS day
               FROM events),
    contrib AS (SELECT user_id, day + w AS win_day
                FROM d, unnest(generate_series(0, 6)) AS t(w)),
    days AS (SELECT DISTINCT day FROM d)
    SELECT c.win_day AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS users_7d
    FROM contrib c JOIN days ON c.win_day = days.day
    GROUP BY 1
    """,
)
def ev_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (the DAU/WAU family).
    Distinct counts don't merge across windows, so the scalable exact
    form EXPLODES each (user, day) into the 7 window-days it
    contributes to, then counts distinct per window — shuffle volume
    is 7× the deduped (user, day) table, NOT 7× the event stream.

    Scale: the per-day dedup partial-aggregates map-side first; beyond
    that, swap COUNT(DISTINCT) for HLL sketches (approx_count_distinct
    per day + union-merge) when 7× dedup volume is still too big —
    same plan shape, mergeable state."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).distinct()
    contrib = d.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day")
    )
    days = d.select("day").distinct()
    return (
        contrib.join(F.broadcast(days), contrib.win_day == days.day)
        .groupBy(F.col("win_day").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("users_7d"))
    )


@query(
    "ev_markov",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS next_type
               FROM events),
    t AS (SELECT event_type AS from_type, next_type AS to_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           FLOOR(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type) * 10000 + 0.5) / 10000
             AS p
    FROM t
    """,
)
def ev_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    (event_type → next event_type) pair, the transition count and
    probability. The user-journey model behind next-action prediction
    and funnel-leak analysis.

    Scale: lead() shuffles once on user_id (same exchange the session
    ops use); the transition count then collapses to |types|² rows
    map-side, and the row-normalization window runs on that tiny
    matrix."""
    ev = cat(spark, sf_dir)["events"]
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = s.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wn = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        ratio(F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    )


@query(
    "graph_degree",
    oracle="""
    WITH e AS (SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS lo,
                               greatest(c.c_nationkey, s.s_nationkey) AS hi
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               WHERE c.c_nationkey <> s.s_nationkey),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT lo AS x FROM e UNION ALL SELECT hi FROM e)
            GROUP BY 1)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the nation trade graph — the first
    diagnostic of any graph workload (skew in degree = skew in every
    downstream shuffle; a power-law tail here is why salting and
    degree-ordered triangle counting exist).

    Scale: degrees are one groupBy over the doubled edge list; the
    histogram is a second tiny aggregate. Edge derivation dominates
    and is shared with graph_triangles (broadcast dims, one fact
    scan)."""
    c = cat(spark, sf_dir)
    li, orders = c["lineitem"], c["orders"]
    cust, supp = c["customer"], c["supplier"]
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("lo"),
            F.greatest("c_nationkey", "s_nationkey").alias("hi"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("lo").alias("x"))
        .unionAll(e.select("hi"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


ATTR_US = 60 * 60 * 1_000_000  # 1-hour attribution window


@query(
    "ev_attribution",
    oracle=f"""
    WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT event_id AS tid, user_id, event_type, epoch_us(ts) AS tus
          FROM events WHERE event_type IN ('view', 'click')),
    touch AS (SELECT p.pid, t.event_type
              FROM p JOIN t ON p.user_id = t.user_id
                          AND t.tus < p.pus AND t.tus >= p.pus - {ATTR_US}),
    sized AS (SELECT pid, event_type,
                     CAST(COUNT(*) AS BIGINT) AS k,
                     SUM(COUNT(*)) OVER (PARTITION BY pid) AS n_touch
              FROM touch GROUP BY 1, 2)
    SELECT event_type AS channel,
           CAST(SUM(k) AS BIGINT) AS n_touches,
           FLOOR(SUM(CAST(k AS DOUBLE) / n_touch) * 10000 + 0.5) / 10000
             AS credit
    FROM sized GROUP BY 1
    """,
)
def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click in the hour
    before a purchase shares that purchase's credit equally; summed
    per channel. The marketing-analytics staple the as-of join (last
    touch) can't express.

    Scale: the purchase×touch pairing reuses ev_range_join's
    time-bucket explode (equi-join on (user, bucket), probe side
    doubled) — never an inequality nested loop; credit normalization
    is a window over per-purchase channel counts, keyed by purchase."""
    ev = cat(spark, sf_dir)["events"]
    with_us = ev.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    p = (
        with_us.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.col("us").alias("pus"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("pus") / ATTR_US) - 1,
                    F.floor(F.col("pus") / ATTR_US),
                )
            ),
        )
    )
    t = with_us.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        "event_type",
        F.col("us").alias("tus"),
        F.floor(F.col("us") / ATTR_US).alias("bucket"),
    )
    touch = p.join(t, ["bucket"]).filter(
        (F.col("p_user") == F.col("t_user"))
        & (F.col("tus") < F.col("pus"))
        & (F.col("tus") >= F.col("pus") - ATTR_US)
    )
    from pyspark.sql import Window as W

    sized = touch.groupBy("pid", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    sized = sized.withColumn("n_touch", F.sum("k").over(W.partitionBy("pid")))
    return sized.groupBy(F.col("event_type").alias("channel")).agg(
        F.sum("k").cast("bigint").alias("n_touches"),
        ratio(F.sum(F.col("k").cast("double") / F.col("n_touch"))).alias("credit"),
    )
