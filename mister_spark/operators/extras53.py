"""Wave 53: scale sketches + feature engineering — Bloom-filter
contamination screening, HITS hubs/authorities, point-in-time lag
features, and permissive-mode corrupt-record auditing.

sketch_bloom_contamination is how contamination screening actually runs
at 100 TB: the benchmark's n-gram set folds into a fixed 8 KiB bit set
that broadcasts everywhere (ds_contamination's exact join stays as the
audit twin — Bloom has NO false negatives, so the exact pass only needs
to re-check the flagged slice); graph_hits adds the second classic
link-analysis fixed point next to mr_pagerank; ml_lag_features is the
forecasting feature matrix (lags + rolling means per user-day) built
gap-aware with RANGE windows; io_corrupt_records keeps the permissive
CSV ingest path honest — count, quarantine, and aggregate around bad
rows instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens, trigrams
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions (double-hashing trick)
BENCH_MOD = 97  # doc_id % 97 == 0 plays the benchmark corpus
HITS_ITERS = 8
HITS_TOP = 10
CSV_BAD_MOD = 41  # o_orderkey % 41 == 0 rows are written malformed

# portable trigram hash: polynomial fold of per-token codes
# (ascii(first)*131 + len) with the house FP constants
_DUCK_TRI = (
    f"list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    f"i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
)


def _duck_ghash(g: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({g}, ' '), "
        f"x -> CAST(ascii(x) * 131 + len(x) AS BIGINT))), "
        f"(a, b) -> (a * {FP_MUL} + b) % {FP_MOD})"
    )


def _ghash_col(g) -> F.Column:
    codes = F.transform(
        F.split(g, " "), lambda x: (F.ascii(x) * 131 + F.length(x)).cast("long")
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda a, b: (a * FP_MUL + b) % FP_MOD
    )


def _positions_cols(h):
    h1 = h % BLOOM_M
    h2 = 1 + (h % (BLOOM_M - 1))
    return [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]


def _positions_sql(h: str) -> list[str]:
    h1 = f"(({h}) % {BLOOM_M})"
    h2 = f"(1 + (({h}) % {BLOOM_M - 1}))"
    return [f"(({h1} + {i} * {h2}) % {BLOOM_M})" for i in range(BLOOM_K)]


@query(
    "sketch_bloom_contamination",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {DUCK_TOKENS} AS toks FROM documents),
    tri AS (SELECT doc_id, source, unnest({_DUCK_TRI}) AS g
            FROM t WHERE len(toks) >= 3),
    bg AS (SELECT DISTINCT g FROM tri WHERE doc_id % {BENCH_MOD} = 0),
    bh AS (SELECT g, {_duck_ghash('g')} AS h FROM bg),
    pos AS (SELECT DISTINCT p FROM (
              {" UNION ALL ".join(
                  f"SELECT {p} AS p FROM bh" for p in _positions_sql("h")
              )})),
    bits AS (SELECT list(p ORDER BY p) AS bs FROM pos),
    ev AS (SELECT doc_id, source, g FROM tri WHERE doc_id % {BENCH_MOD} <> 0),
    eg AS (SELECT g, {_duck_ghash('g')} AS h FROM (SELECT DISTINCT g FROM ev)),
    em AS (SELECT eg.g,
                  CASE WHEN {" AND ".join(
                      f"list_contains(bits.bs, {p})"
                      for p in _positions_sql("eg.h")
                  )} THEN 1 ELSE 0 END AS bloom,
                  CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END AS exact
           FROM eg CROSS JOIN bits LEFT JOIN bg ON eg.g = bg.g),
    d AS (SELECT ev.doc_id, ev.source,
                 MAX(em.bloom) AS bloom, MAX(em.exact) AS exact
          FROM ev JOIN em ON ev.g = em.g GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(exact) AS BIGINT) AS n_exact,
           CAST(SUM(bloom) AS BIGINT) AS n_bloom,
           CAST(SUM(bloom) - SUM(exact) AS BIGINT) AS n_fp,
           FLOOR(CAST(SUM(bloom) - SUM(exact) AS DOUBLE)
                 / GREATEST(COUNT(*) - SUM(exact), 1) * 10000 + 0.5)
             / 10000 AS fp_rate
    FROM d GROUP BY source
    """,
)
def sketch_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination screen: the benchmark corpus's
    distinct trigrams hash into a {m}-bit / {k}-hash Bloom set (the
    double-hashing construction, portable integer arithmetic), and
    every eval document is flagged if ANY trigram hits all {k} bits.
    Reported per source with the exact-join ground truth beside it —
    Bloom can only over-flag (no false negatives), so n_bloom ≥ n_exact
    row-by-row, and fp_rate is the measured false-positive rate.

    Scale: this is the 100 TB form of ds_contamination — the bench-side
    trigram set collapses to ≤{m} positions (a 1-row broadcast array,
    ~8 KiB regardless of benchmark size), eval membership is a narrow
    map over the distinct-trigram frame, and the only data-sized
    shuffles are the trigram dedup and the per-doc rollup. The exact
    join then reruns on the flagged slice only (here it runs on all
    eval docs so the oracle can audit the FP accounting)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select(
        "doc_id", "source", tokens().alias("toks")
    ).filter(F.size("toks") >= 3)
    tri = (
        t.select(
            "doc_id", "source", F.explode(trigrams(F.col("toks"))).alias("g")
        )
        .dropDuplicates(["doc_id", "g"])
        # read by 4 branches (bench set, bloom bits, eval grams, the
        # per-doc rollup join): without the checkpoint the tokenize +
        # trigram + dedup pipeline re-executes per branch (guide §1.2;
        # the dd_minhash_lsh checkpoint finding)
        .localCheckpoint()
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bg = tri.filter(is_bench).select("g").distinct()
    bh = bg.select("g", _ghash_col(F.col("g")).alias("h"))
    ps = _positions_cols(F.col("h"))
    pos = (
        bh.select(F.explode(F.array(*ps)).alias("p")).distinct()
    )
    bits = pos.agg(F.sort_array(F.collect_list("p")).alias("bs"))
    ev = tri.filter(~is_bench)
    eg = ev.select("g").distinct().withColumn("h", _ghash_col(F.col("g")))
    eps = _positions_cols(F.col("h"))
    cond = F.array_contains("bs", eps[0])
    for p in eps[1:]:
        cond = cond & F.array_contains("bs", p)
    em = (
        eg.join(F.broadcast(bits))
        .withColumn("bloom", cond.cast("int"))
        .join(F.broadcast(bg.withColumn("ex", F.lit(1))), "g", "left")
        .select("g", "bloom", F.coalesce("ex", F.lit(0)).alias("exact"))
    )
    d = (
        ev.join(em, "g")
        .groupBy("doc_id", "source")
        .agg(F.max("bloom").alias("bloom"), F.max("exact").alias("exact"))
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("exact").cast("bigint").alias("n_exact"),
        F.sum("bloom").cast("bigint").alias("n_bloom"),
        (F.sum("bloom") - F.sum("exact")).cast("bigint").alias("n_fp"),
        ratio(
            (F.sum("bloom") - F.sum("exact")).cast("double")
            / F.greatest(F.count(F.lit(1)) - F.sum("exact"), F.lit(1))
        ).alias("fp_rate"),
    )


sketch_bloom_contamination.__doc__ = sketch_bloom_contamination.__doc__.format(
    m=BLOOM_M, k=BLOOM_K
)


def hits_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer→supplier edges (distinct) from orders ⋈
    lineitem — hubs are buyers, authorities are the suppliers they
    concentrate on."""
    c = cat(spark, sf_dir)
    li = c["lineitem"].select("l_orderkey", "l_suppkey")
    o = c["orders"].select("o_orderkey", "o_custkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .distinct()
    )


@query(
    "graph_hits",
    # Real oracle: each recursive step runs the FULL HITS iteration —
    # authorities from the working hubs (L2-normalized via a window),
    # then hubs from those authorities (the authority subquery is
    # repeated inline for the hub half-step; multiple self-references
    # are legal in DuckDB's recursive terms and both copies evaluate
    # identically). Rows are tagged 'a'/'h' so iteration {it}'s pair is
    # read back for the two top-{top} lists, ordered by the ROUNDED
    # score exactly like the Spark frame.
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hits AS (
      -- CAST: a bare 1.0 would type the recursive score column
      -- DECIMAL(2,1) and truncate every normalized score
      SELECT 0 AS it, 'h' AS side, src AS node, CAST(1.0 AS DOUBLE) AS sc
      FROM (SELECT DISTINCT src FROM e)
      UNION ALL
      SELECT it + 1, side, node, sc FROM (
        SELECT ar.it, 'a' AS side, ar.node,
               ar.s / SQRT(SUM(ar.s * ar.s) OVER (PARTITION BY ar.it)) AS sc
        FROM (SELECT h.it, e.dst AS node, SUM(h.sc) AS s
              FROM hits h JOIN e ON e.src = h.node
              WHERE h.side = 'h' AND h.it < {HITS_ITERS}
              GROUP BY h.it, e.dst) ar
        UNION ALL
        SELECT hr.it, 'h' AS side, hr.node,
               hr.s / SQRT(SUM(hr.s * hr.s) OVER (PARTITION BY hr.it)) AS sc
        FROM (SELECT an.it, e2.src AS node, SUM(an.sc) AS s
              FROM (SELECT ar.it, ar.node,
                           ar.s / SQRT(SUM(ar.s * ar.s)
                                       OVER (PARTITION BY ar.it)) AS sc
                    FROM (SELECT h.it, e.dst AS node, SUM(h.sc) AS s
                          FROM hits h JOIN e ON e.src = h.node
                          WHERE h.side = 'h' AND h.it < {HITS_ITERS}
                          GROUP BY h.it, e.dst) ar) an
              JOIN e e2 ON e2.dst = an.node
              GROUP BY an.it, e2.src) hr
      ) step
    )
    SELECT node_type, node_id, score FROM (
      SELECT 'supplier' AS node_type, node AS node_id,
             FLOOR(sc * 1e6 + 0.5) / 1e6 AS score
      FROM hits WHERE it = {HITS_ITERS} AND side = 'a'
      ORDER BY score DESC, node_id LIMIT {HITS_TOP}) ta
    UNION ALL
    SELECT node_type, node_id, score FROM (
      SELECT 'customer' AS node_type, node AS node_id,
             FLOOR(sc * 1e6 + 0.5) / 1e6 AS score
      FROM hits WHERE it = {HITS_ITERS} AND side = 'h'
      ORDER BY score DESC, node_id LIMIT {HITS_TOP}) th
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the customer→supplier purchase
    graph: {it} power iterations of a = Eᵀh, h = Ea with L2
    normalization each half-step, reporting the top-{top} of each side.

    Scale: each half-step is one equi-join of the edge list against a
    node-scores frame plus a groupBy on the join key — both partition
    by node id, no broadcast of anything data-sized (the L2 norm is a
    1-row broadcast). Per-iteration `localCheckpoint` truncates the
    lineage exactly like mr_pagerank; 2·{it} joins total, each linear
    in |E|."""
    e = hits_edges(spark, sf_dir).localCheckpoint()
    h = e.select("src").distinct().withColumn("hs", F.lit(1.0))
    for _ in range(HITS_ITERS):
        a = (
            e.join(h, "src")
            .groupBy("dst")
            .agg(F.sum("hs").alias("as_"))
        )
        n = a.agg(F.sqrt(F.sum(F.col("as_") * F.col("as_"))).alias("nrm"))
        a = a.join(F.broadcast(n)).select(
            "dst", (F.col("as_") / F.col("nrm")).alias("as_")
        )
        h = (
            e.join(a, "dst")
            .groupBy("src")
            .agg(F.sum("as_").alias("hs"))
        )
        nh = h.agg(F.sqrt(F.sum(F.col("hs") * F.col("hs"))).alias("nrm"))
        h = (
            h.join(F.broadcast(nh))
            .select("src", (F.col("hs") / F.col("nrm")).alias("hs"))
            .localCheckpoint()
        )
        a = a.localCheckpoint()
    top_a = (
        a.select(
            F.lit("supplier").alias("node_type"),
            F.col("dst").alias("node_id"),
            rnd(F.col("as_"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "node_id")
        .limit(HITS_TOP)
    )
    top_h = (
        h.select(
            F.lit("customer").alias("node_type"),
            F.col("src").alias("node_id"),
            rnd(F.col("hs"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "node_id")
        .limit(HITS_TOP)
    )
    return top_a.unionAll(top_h)


graph_hits.__doc__ = graph_hits.__doc__.format(it=HITS_ITERS, top=HITS_TOP)


@query(
    "ml_lag_features",
    oracle="""
    WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(value) AS v
               FROM events GROUP BY 1, 2),
    k AS (SELECT user_id, day, n, v,
                 date_diff('day', DATE '1970-01-01', day) AS dn
          FROM d)
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
           FLOOR(v * 10000 + 0.5) / 10000 AS v,
           FLOOR(MAX(v) OVER (PARTITION BY user_id ORDER BY dn
                              RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING)
                 * 10000 + 0.5) / 10000 AS lag1,
           FLOOR(MAX(v) OVER (PARTITION BY user_id ORDER BY dn
                              RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING)
                 * 10000 + 0.5) / 10000 AS lag7,
           FLOOR(AVG(v) OVER (PARTITION BY user_id ORDER BY dn
                              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 10000 + 0.5) / 10000 AS roll7,
           CAST(isodow(day) AS BIGINT) AS dow
    FROM k
    """,
)
def ml_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time forecasting feature matrix per (user, day): event
    count, value sum, calendar-aware lag-1 / lag-7 values (RANGE windows
    keyed on the day number, so gaps yield NULL instead of silently
    misaligning — the classic ROWS-window bug), trailing-7-day mean,
    and ISO day-of-week.

    Scale: everything partitions by user_id — one shuffle to the
    user-day grain, then per-user windows over day-count-bounded
    frames. This is the feature-store materialization pattern: no
    global state, no cross-user traffic."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("dayts")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("value").alias("v"),
    )
    k = d.withColumn(
        "dn", F.datediff(F.col("dayts"), F.lit("1970-01-01"))
    )
    wu = W.partitionBy("user_id").orderBy("dn")
    lag1 = F.max("v").over(wu.rangeBetween(-1, -1))
    lag7 = F.max("v").over(wu.rangeBetween(-7, -7))
    roll7 = F.avg("v").over(wu.rangeBetween(-6, 0))
    return k.select(
        "user_id",
        F.date_format("dayts", "yyyy-MM-dd").alias("day"),
        "n",
        ratio(F.col("v")).alias("v"),
        ratio(lag1).alias("lag1"),
        ratio(lag7).alias("lag7"),
        ratio(roll7).alias("roll7"),
        (F.expr("weekday(dayts)") + 1).cast("bigint").alias("dow"),
    )


@query(
    "io_corrupt_records",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % {CSV_BAD_MOD} = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           FLOOR(SUM(CASE WHEN o_orderkey % {CSV_BAD_MOD} <> 0
                     THEN o_totalprice ELSE 0 END) * 100 + 0.5) / 100
             AS total_good
    FROM orders GROUP BY 1
    """,
)
def io_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive-mode dirty-CSV audit: a staged CSV of orders carries a
    deliberately unparseable totalprice on every orderkey ≡ 0 (mod
    {bad}) row; the read declares a `_corrupt` column, so bad rows land
    with the raw line quarantined instead of killing the job, and the
    rollup counts good vs corrupt per status and sums revenue over the
    good rows only. The oracle recomputes the same accounting from the
    typed parquet — parity proves the permissive parse neither drops
    nor double-counts rows.

    Scale: CSV scanning is line-parallel; the corrupt-column pattern is
    THE production answer to 'one bad row in 100 TB of vendor CSV' —
    never DROPMALFORMED (silent) or FAILFAST (all-or-nothing)."""
    from mister_spark.sources.staged import stage_corrupt_csv_orders

    path = stage_corrupt_csv_orders(spark, sf_dir)
    o = spark.read.csv(
        path,
        schema=(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, _corrupt string"
        ),
        columnNameOfCorruptRecord="_corrupt",
        mode="PERMISSIVE",
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_corrupt").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_corrupt"),
        money(
            F.sum(
                F.when(F.col("_corrupt").isNull(), F.col("o_totalprice"))
                .otherwise(0.0)
            )
        ).alias("total_good"),
    )


io_corrupt_records.__doc__ = io_corrupt_records.__doc__.format(bad=CSV_BAD_MOD)
