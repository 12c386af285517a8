"""Relational/analytics wave 3: RANGE-frame rolling windows, linear
regression, distribution entropy, time-series gap fill, TF-IDF, graph
triangle counting, and an SCD2 (slowly-changing-dimension) merge.

These round out the analytic surface a mister user would expect from a
general-purpose engine: value-range window frames (not just ROWS),
closed-form regression stats, information-theoretic profiling,
resampling sparse series onto a dense grid, classic IR scoring, a
join-based graph motif count, and the upsert/merge pattern every
warehouse load needs. All JVM-side column expressions — no Python UDFs.

Cross-engine rules per operators/common.py: rnd() rounding, dates as
yyyy-MM-dd strings, counts as bigint, explicit tiebreaks before top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
SCD_T0 = "1990-01-01"  # synthetic "initial load" effective date
SCD_INF = "9999-12-31"


@query(
    "w_rolling_range",
    oracle=f"""
    WITH d AS (SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
                      CAST(date_diff('day', DATE '{EPOCH}',
                                     date_trunc('day', o_orderdate)) AS BIGINT)
                        AS day_num,
                      FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS rev
               FROM orders GROUP BY 1, 2)
    SELECT day, day_num, rev,
           FLOOR(SUM(rev) OVER w * 100 + 0.5) / 100 AS rev_7d,
           FLOOR(AVG(rev) OVER w * 10000 + 0.5) / 10000 AS avg_7d
    FROM d WINDOW w AS (ORDER BY day_num
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def w_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue via a RANGE window frame keyed on epoch
    days — a *value*-range frame, so calendar gaps shrink the window
    (unlike a ROWS frame, which would silently span gaps).

    Scale: the input is pre-aggregated to one row per day before the
    window, so the ordered frame runs over ~10^3-10^4 rows regardless
    of fact-table size; the expensive part is the partial-aggregated
    groupBy, not the window. For per-key rolling windows at 100 TB the
    same plan partitions the window by key."""
    orders = cat(spark, sf_dir)["orders"]
    d = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(money(F.sum("o_totalprice")).alias("rev"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.datediff(F.col("d"), F.lit(EPOCH).cast("date"))
            .cast("bigint")
            .alias("day_num"),
            "rev",
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return d.select(
        "day",
        "day_num",
        "rev",
        money(F.sum("rev").over(w)).alias("rev_7d"),
        ratio(F.avg("rev").over(w)).alias("avg_7d"),
    )


@query(
    "stat_regression",
    oracle="""
    WITH s AS (SELECT l_returnflag,
                      CAST(COUNT(*) AS DOUBLE) AS n,
                      SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
                      SUM(l_quantity * l_quantity) AS sxx,
                      SUM(l_extendedprice * l_extendedprice) AS syy,
                      SUM(l_quantity * l_extendedprice) AS sxy
               FROM lineitem GROUP BY 1)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 100 + 0.5) / 100
             AS slope,
           FLOOR((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 * 100 + 0.5) / 100 AS intercept,
           FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS r2
    FROM s
    """,
)
def stat_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity) from raw
    moment sums — the closed-form slope/intercept/r² every engine's
    regr_* family computes. Built from plain SUMs rather than the
    engines' regr_* aggregates so BOTH engines evaluate the identical
    formula (their internal accumulators differ numerically).

    Scale: six partial-aggregable SUMs per group — one map-side-combined
    shuffle, mergeable across any number of partitions, no second
    pass (contrast the textbook two-pass mean-centered form)."""
    li = cat(spark, sf_dir)["lineitem"]
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        money(slope).alias("slope"),
        money((sy - slope * sx) / n).alias("intercept"),
        ratio(cov_n * cov_n / (var_x * var_y)).alias("r2"),
    )


@query(
    "stat_entropy",
    oracle="""
    WITH c AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS cnt
               FROM events GROUP BY 1),
    t AS (SELECT SUM(cnt) AS tot, CAST(COUNT(*) AS BIGINT) AS n_types FROM c)
    SELECT t.n_types,
           FLOOR(-SUM((c.cnt / t.tot) * log2(c.cnt / t.tot)) * 10000 + 0.5)
             / 10000 AS entropy
    FROM c, t GROUP BY t.n_types
    """,
)
def stat_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the event-type distribution — the
    information-theoretic profile stat used for e.g. feature screening
    and corpus-balance monitoring.

    Scale: groupBy on a low-cardinality key collapses the fact table to
    a handful of rows map-side; the entropy fold runs on that tiny
    result (broadcast single-row total). One shuffle of ~|types| rows."""
    ev = cat(spark, sf_dir)["events"]
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    t = c.agg(
        F.sum("cnt").alias("tot"), F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    p = F.col("cnt") / F.col("tot")
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("n_types")
        .agg(ratio(-F.sum(p * F.log2(p))).alias("entropy"))
    )


@query(
    "ev_gap_fill",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                      date_trunc('hour', MAX(ts)) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    hr AS (SELECT date_trunc('hour', ts) AS h, event_type,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  FLOOR(SUM(value) * 100 + 0.5) / 100 AS total
           FROM events GROUP BY 1, 2)
    SELECT strftime(g.h, '%Y-%m-%d %H:00') AS hour, ty.event_type,
           CAST(COALESCE(hr.n, 0) AS BIGINT) AS n,
           COALESCE(hr.total, 0.0) AS total
    FROM g CROSS JOIN ty
    LEFT JOIN hr ON hr.h = g.h AND hr.event_type = ty.event_type
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample a sparse event stream onto a dense hourly grid: build
    the full (hour × event_type) grid with sequence()+explode and left
    join the hourly aggregate, zero-filling empty cells — the gap-fill
    every dashboard/forecasting pipeline needs (missing hours must be
    0, not absent).

    Scale: the grid is synthetic and tiny (hours_in_range × types) no
    matter how large the fact table; the aggregate is partial-combined
    before its one shuffle, and the grid side of the left join is
    broadcast. Never materializes a dense fact-sized frame."""
    ev = cat(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        money(F.sum("value")).alias("total"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    full = F.broadcast(grid.crossJoin(types))
    return full.join(hourly, ["h", "event_type"], "left").select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


@query(
    "tx_tfidf",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
               WHERE len({DUCK_TOKENS}) >= 1),
    ex AS (SELECT doc_id, unnest(toks) AS term, len(toks) AS dlen FROM t),
    tf AS (SELECT doc_id, term, ANY_VALUE(dlen) AS dlen,
                  CAST(COUNT(*) AS DOUBLE) AS c
           FROM ex GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
    sc AS (SELECT tf.doc_id, tf.term,
                  FLOOR((tf.c / tf.dlen) * ln(nd.n / df.df) * 10000 + 0.5)
                    / 10000 AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN nd)
    SELECT doc_id, term, tfidf FROM
      (SELECT doc_id, term, tfidf,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS rk
       FROM sc) WHERE rk = 1
    """,
)
def tx_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive term per document by TF-IDF (tf = in-doc share,
    idf = ln(N/df)), ranked on the *rounded* score with a term
    tiebreak so both engines pick identical winners.

    Scale: explode → (doc, term) count is one partial-agg shuffle; the
    document-frequency table is vocabulary-sized (Zipf: ≪ corpus) and
    joins broadcast; the corpus count N is a 1-row cross join. The
    per-doc top-1 window shuffles on doc_id — the same key as tf, so
    AQE coalesces them; no global sort anywhere."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 1)
    ex = t.select(
        "doc_id", F.explode("toks").alias("term"), F.size("toks").alias("dlen")
    )
    tf = ex.groupBy("doc_id", "term").agg(
        F.first("dlen").alias("dlen"), F.count(F.lit(1)).cast("double").alias("c")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    nd = t.agg(F.count(F.lit(1)).cast("double").alias("n"))
    sc = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            ratio((F.col("c") / F.col("dlen")) * F.log(F.col("n") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "graph_triangles",
    oracle="""
    WITH e AS (SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS lo,
                               greatest(c.c_nationkey, s.s_nationkey) AS hi
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               WHERE c.c_nationkey <> s.s_nationkey),
    n AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS n_nodes
          FROM (SELECT lo AS x FROM e UNION SELECT hi FROM e)),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e a JOIN e b ON a.hi = b.lo
                     JOIN e c ON c.lo = a.lo AND c.hi = b.hi)
    SELECT n.n_nodes, m.n_edges, tri.n_triangles FROM n, m, tri
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the nation trade graph (undirected edge =
    some lineitem shipped between the two nations). The canonical
    join-based motif count: orient every edge low→high, then wedges
    (a<b<c) close iff (a,c) is also an edge — each triangle counted
    exactly once.

    Scale: edge derivation is the dominant cost and is all
    broadcast-joinable dims around one fact scan; the motif joins run
    on the *deduplicated* edge list. For web-scale graphs you'd first
    order by degree instead of key (cuts wedge count from Σd² to
    O(m^1.5)) — same plan shape, different orientation column."""
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
        # five plan branches (node count, edge count, three motif-join
        # sides) reference this frame — cut the lineage once so the
        # 4-table derivation runs once, not five times (10 → 4 exchanges)
        .localCheckpoint()
    )
    n = (
        e.select(F.col("lo").alias("x"))
        .union(e.select("hi"))
        .agg(F.countDistinct("x").cast("bigint").alias("n_nodes"))
    )
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    a, b, cc = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(b, F.col("a.hi") == F.col("b.lo"))
        .join(cc, (F.col("c.lo") == F.col("a.lo")) & (F.col("c.hi") == F.col("b.hi")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return n.crossJoin(m).crossJoin(tri)


@query(
    "scd2_upsert",
    oracle=f"""
    WITH ch AS (SELECT o_custkey AS custkey,
                       strftime(date_trunc('day', MAX(o_orderdate)), '%Y-%m-%d')
                         AS eff,
                       FLOOR(SUM(o_totalprice) * 0.1 * 100 + 0.5) / 100 AS delta
                FROM orders GROUP BY 1)
    SELECT c.c_custkey AS custkey,
           FLOOR(c.c_acctbal * 100 + 0.5) / 100 AS bal,
           '{SCD_T0}' AS valid_from, '{SCD_INF}' AS valid_to,
           CAST(1 AS BIGINT) AS is_current
    FROM customer c ANTI JOIN ch ON c.c_custkey = ch.custkey
    UNION ALL
    SELECT c.c_custkey, FLOOR(c.c_acctbal * 100 + 0.5) / 100,
           '{SCD_T0}', ch.eff, CAST(0 AS BIGINT)
    FROM customer c JOIN ch ON c.c_custkey = ch.custkey
    UNION ALL
    SELECT c.c_custkey,
           FLOOR((FLOOR(c.c_acctbal * 100 + 0.5) / 100 + ch.delta) * 100 + 0.5)
             / 100,
           ch.eff, '{SCD_INF}', CAST(1 AS BIGINT)
    FROM customer c JOIN ch ON c.c_custkey = ch.custkey
    """,
)
def scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge: apply a change feed (here: a balance delta
    derived from each customer's orders, effective at their latest
    order date) to the customer dimension, emitting history rows —
    untouched customers keep one open row; changed customers get their
    old row closed at the effective date plus a new open row. This is
    the MERGE INTO / upsert pattern expressed as joins + unions, which
    is exactly how engines without ACID MERGE implement warehouse
    loads (rewrite = anti ∪ closed ∪ new).

    Scale: one shuffle to build the change feed, then the dim⋈feed
    joins share the custkey partitioning (AQE reuses the exchange);
    with the dim bucketed by custkey (sources/bucketed.py) the merge
    is zero-shuffle on the dim side — the Delta/Iceberg-style MERGE
    fast path."""
    c = cat(spark, sf_dir)
    cust, orders = c["customer"], c["orders"]
    ch = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.date_format(F.date_trunc("day", F.max("o_orderdate")), "yyyy-MM-dd").alias(
            "eff"
        ),
        money(F.sum("o_totalprice") * 0.1).alias("delta"),
    )
    bal = money(F.col("c_acctbal")).alias("bal")
    unchanged = cust.join(ch, cust.c_custkey == ch.custkey, "anti").select(
        F.col("c_custkey").alias("custkey"),
        bal,
        F.lit(SCD_T0).alias("valid_from"),
        F.lit(SCD_INF).alias("valid_to"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    joined = cust.join(ch, cust.c_custkey == ch.custkey)
    closed = joined.select(
        "custkey",
        bal,
        F.lit(SCD_T0).alias("valid_from"),
        F.col("eff").alias("valid_to"),
        F.lit(0).cast("bigint").alias("is_current"),
    )
    opened = joined.select(
        "custkey",
        money(money(F.col("c_acctbal")) + F.col("delta")).alias("bal"),
        F.col("eff").alias("valid_from"),
        F.lit(SCD_INF).alias("valid_to"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    return unchanged.unionAll(closed).unionAll(opened)


@query(
    "w_percent_rank",
    oracle="""
    WITH s AS (SELECT c_custkey AS custkey, c_mktsegment AS segment,
                      FLOOR(c_acctbal * 100 + 0.5) / 100 AS bal
               FROM customer)
    SELECT custkey, segment, bal,
           FLOOR(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pct_rank,
           FLOOR(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cume
    FROM s WINDOW w AS (PARTITION BY segment ORDER BY bal, custkey)
    """,
)
def w_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of every customer's balance inside its market
    segment: percent_rank (share strictly below) and cume_dist (share at
    or below), ordered on the rounded balance with a custkey tiebreak so
    tie handling is identical cross-engine.

    Scale: one shuffle partitioned by segment; each partition sorts
    independently. Low segment cardinality → few fat partitions, so at
    100 TB the scale path is range-partitioning within segment and
    computing ranks from per-range counts (two narrow passes)."""
    cust = cat(spark, sf_dir)["customer"]
    s = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        money(F.col("c_acctbal")).alias("bal"),
    )
    w = Window.partitionBy("segment").orderBy("bal", "custkey")
    return s.select(
        "custkey",
        "segment",
        "bal",
        ratio(F.percent_rank().over(w)).alias("pct_rank"),
        ratio(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "stat_freq_items",
    # Round-11 rows-only conversion (the qsketch precedent): the
    # freqItems sketch state itself is engine-local, but its CONTRACT
    # (candidates ⊇ items with frequency > support·n) makes the
    # sketch-candidates → exact-verify composition deterministic: the
    # verified output is exactly the strict heavy hitters, which
    # DuckDB replays with plain integer arithmetic. A sketch that
    # ever dropped a true heavy hitter now fails the hash check, not
    # just a pytest superset gate.
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events),
    c AS (SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1)
    SELECT c.item, c.cnt FROM c CROSS JOIN n
    WHERE c.cnt * 10 > n.total
    """,
)
def stat_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters the production way: DataFrame.stat.freqItems
    (Karp/Misra-Gries style single-pass sketch, support = 10%)
    proposes a candidate SUPERSET with constant memory per partition,
    then ONE exact aggregation restricted to those candidates
    verifies and emits the strict heavy hitters (10·count > n) with
    their counts. False positives die in the verify; the sketch's
    no-false-negative guarantee makes the verified set equal to the
    exact answer — which is why this key carries a full DuckDB
    oracle despite the engine-local sketch state (the r11 conversion;
    pytest additionally pins the superset contract).

    Scale: the sketch is a narrow pass + tiny merge; the verify
    aggregates ONLY rows whose key is in the model-sized candidate
    list (broadcast isin), so an exact groupBy over a blow-the-shuffle
    key space is never needed."""
    ev = cat(spark, sf_dir)["events"]
    cands = ev.stat.freqItems(["event_type"], support=0.1).collect()[0][
        "event_type_freqItems"
    ]  # model-sized: ≤ 1/support items by construction
    n_total = ev.count()
    return (
        ev.filter(F.col("event_type").isin(list(cands)))
        .groupBy(F.col("event_type").alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") * 10 > F.lit(n_total))
    )


@query(
    "tx_inverted_index",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
               WHERE len({DUCK_TOKENS}) >= 1),
    ex AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
    FROM ex GROUP BY term
    """,
)
def tx_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term → sorted doc-id posting list (emitted
    as a comma-joined string so both engines serialize identically).
    The core IR/search structure, and the batch shape of every
    search-index bootstrap job.

    Scale: explode + per-doc distinct, then ONE shuffle on term;
    posting lists are built with collect_list + sort_array inside the
    aggregate — per-term memory is the posting list itself, which is
    exactly the output row. For web-scale terms (stopword-like df)
    you'd cap or shard postings (term, shard) — same plan with a salt
    column."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 1)
    ex = t.select(F.explode(F.array_distinct("toks")).alias("term"), "doc_id")
    return ex.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )


@query(
    "ev_forward_fill",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                      date_trunc('hour', MAX(ts)) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    hr AS (SELECT date_trunc('hour', ts) AS h, event_type,
                  FLOOR(SUM(value) * 100 + 0.5) / 100 AS total
           FROM events GROUP BY 1, 2),
    grid AS (SELECT g.h, ty.event_type, hr.total
             FROM g CROSS JOIN ty
             LEFT JOIN hr ON hr.h = g.h AND hr.event_type = ty.event_type)
    SELECT strftime(h, '%Y-%m-%d %H:00') AS hour, event_type,
           CAST(total IS NOT NULL AS BIGINT) AS observed,
           COALESCE(last_value(total IGNORE NULLS)
                      OVER (PARTITION BY event_type ORDER BY h
                            ROWS UNBOUNDED PRECEDING), 0.0) AS filled_total
    FROM grid
    """,
)
def ev_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward) over the dense
    hourly grid: empty (hour, type) cells inherit the most recent
    observed hourly total, 0.0 before the first observation — the
    standard imputation for sensor/metric series feeding models that
    can't take NULLs.

    Scale: same broadcast-grid left join as ev_gap_fill, then one
    window partitioned by type ordered by hour — the fill never looks
    across keys, so it parallelizes per key; at high key cardinality
    this is embarrassingly parallel after one shuffle."""
    ev = cat(spark, sf_dir)["events"]
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        money(F.sum("value")).alias("total")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    full = F.broadcast(grid.crossJoin(types)).join(
        hourly, ["h", "event_type"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return full.select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        F.col("total").isNotNull().cast("bigint").alias("observed"),
        F.coalesce(F.last("total", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "filled_total"
        ),
    )


@query(
    "ds_length_buckets",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents),
    b AS (SELECT doc_id, n_tokens,
                 CAST(FLOOR(log2(n_tokens)) AS BIGINT) AS bucket
          FROM t WHERE n_tokens >= 1)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM b GROUP BY bucket
    """,
)
def ds_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing: assign every document to a power-of-2
    token-length bucket (floor(log2(n))) and profile each bucket — how
    training pipelines group samples of similar length so batches pad
    minimally (padding waste is bounded by 2× within a bucket).

    Scale: pure map + one partial-agg shuffle on a ~log-cardinality
    key; this is the cheapest possible profile of a 100 TB corpus. The
    bucket id doubles as the batching partition key downstream
    (repartition('bucket') → length-homogeneous executor batches)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select(
        "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 1)
    b = t.withColumn("bucket", F.floor(F.log2("n_tokens")).cast("bigint"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
