"""Third wave: sampling, regex tokenization, sliding windows, approx
percentiles, and iterative PageRank."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, rnd
from mister_spark.registry import query


@query(
    "mr_sample",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def mr_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% systematic sample on the key. Production would
    hash first (`xxhash64(key) % 10`) for key-uniformity; plain modulo
    is used here because the oracle must reproduce the exact row set
    cross-engine. Same plan shape either way: narrow filter, pushed to
    the scan."""
    orders = cat(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey", "o_custkey")


@query(
    "tx_token_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
             AS n_rtokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numeric
    FROM documents
    """,
)
def tx_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (letters / digit runs / single
    punctuation as separate tokens). The character-class-only pattern is
    chosen to behave identically under Java regex (Spark) and RE2
    (DuckDB)."""
    docs = cat(spark, sf_dir)["documents"]
    pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("long")
        .alias("n_rtokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_numeric"),
    )


SLIDE_US = 30 * 60 * 1_000_000  # 30-min slide, 1-h length


@query(
    "ev_sliding",
    oracle=f"""
    WITH t AS (SELECT event_type, value, epoch_us(ts) AS tus FROM events),
    w AS (SELECT event_type, value,
                 unnest([((tus // {SLIDE_US}) - 1) * {SLIDE_US},
                         (tus // {SLIDE_US}) * {SLIDE_US}]) AS wstart_us
          FROM t)
    SELECT wstart_us, event_type, COUNT(*) AS n,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total
    FROM w GROUP BY 1, 2
    """,
)
def ev_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window aggregate (1 h length, 30 min slide) via Spark's
    native window() — each event lands in exactly two epoch-aligned
    windows; the oracle reproduces the assignment arithmetically."""
    ev = cat(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum("value")).alias("total"))
        .select(
            F.unix_micros("w.start").alias("wstart_us"), "event_type", "n", "total"
        )
    )


def _approx_percentiles_oracle() -> str:
    from mister_spark.functions.qsketch import (
        qs_oracle_pick,
        qs_oracle_rank,
        qs_oracle_sample,
    )

    p50 = qs_oracle_pick(0.5, "o_totalprice")
    p90 = qs_oracle_pick(0.9, "o_totalprice")
    src = (
        "(SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders)"
    )
    return f"""
    WITH {qs_oracle_sample(src, "o_orderpriority", "o_orderkey")},
    {qs_oracle_rank("o_orderpriority", "o_totalprice")}
    SELECT o_orderpriority,
           FLOOR(({p50}) * 100 + 0.5) / 100 AS p50a,
           FLOOR(({p90}) * 100 + 0.5) / 100 AS p90a
    FROM qs_r GROUP BY o_orderpriority
    """


@query("stat_approx_percentiles", oracle=_approx_percentiles_oracle())
def stat_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate percentiles — the 100 TB path where the
    exact `percentile` would shuffle every value. Round-10 conversion
    from the engine-local t-digest to the PORTABLE md5-60
    hash-threshold sample (functions/qsketch.py): a deterministic ~1k
    uniform sample per group (map-side filter after one grouped-count
    broadcast, the KMV mergeable-sketch shape), exact type-1 quantiles
    of the sample — so the whole estimator replays bit-for-bit in the
    DuckDB oracle. Accuracy vs the exact stat_percentiles is bounded
    in tests (rank SE ~1.6% at K=1024)."""
    from mister_spark.functions.qsketch import qs_quantiles, qs_sample

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    sample = qs_sample(orders, ["o_orderpriority"], F.col("o_orderkey"))
    q = qs_quantiles(
        sample, ["o_orderpriority"], "o_totalprice",
        {"p50a": 0.5, "p90a": 0.9},
    )
    return q.select(
        "o_orderpriority",
        money(F.col("p50a")).alias("p50a"),
        money(F.col("p90a")).alias("p90a"),
    )


PAGERANK_ITERS = 5
DAMPING = 0.85


@query(
    "mr_pagerank",
    # The fixed-iteration loop is exactly expressible as a DuckDB
    # recursive CTE (aggregates and multiple self-references are legal
    # in its recursive term), so this iterative op gets a REAL oracle:
    # same damping, same dangling redistribution, same round-6 output.
    # Helper CTEs deliberately avoid top-level UNION (under WITH
    # RECURSIVE DuckDB 1.0 treats `a UNION b` CTE bodies as
    # union-CTEs and skips the dedup) — DISTINCT over UNION ALL.
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    out_w AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    pr AS (
      SELECT 0 AS it, node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
      UNION ALL
      SELECT d.it + 1, n.node,
             (1.0 - {DAMPING}) / nn.n
             + {DAMPING} * (COALESCE(c.in_rank, 0.0) + d.dang / nn.n)
      FROM nodes n
      CROSS JOIN nn
      CROSS JOIN (SELECT it,
                    COALESCE(SUM(CASE WHEN ow.src IS NULL THEN rank END),
                             0.0) AS dang
                  FROM pr LEFT JOIN out_w ow ON ow.src = pr.node
                  GROUP BY it) d
      LEFT JOIN (SELECT e.dst AS node, SUM(p2.rank * e.w / ow.ow) AS in_rank
                 FROM pr p2
                 JOIN out_w ow ON ow.src = p2.node
                 JOIN edges e ON e.src = p2.node
                 GROUP BY 1) c ON c.node = n.node
      WHERE d.it < {PAGERANK_ITERS}
    )
    SELECT node, FLOOR(rank * 1e6 + 0.5) / 1e6 AS rank
    FROM pr WHERE it = {PAGERANK_ITERS}
    """,
)
def mr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (supplier nation →
    customer nation, edge weight = lineitem count), the canonical
    iterative-MapReduce workload, as a fixed 5-iteration DataFrame loop.

    Scale notes: the only data-sized work is the edge build (lineitem
    ⋈ orders ⋈ dims → nation-pair counts); the GRAPH is nation-sized
    (≤ 25 nodes, ≤ 625 weighted edges), so the 5 power iterations run
    as ONE single-row expression fold over the collected edge array
    instead of 5 rounds of distributed join + checkpoint + dangling
    broadcast (guide §1.2: don't pay per-job scheduling for
    model-sized state; same replay pattern as ml_sinkhorn_ot). The
    arrays ride as column attributes so lambda indexing is O(1), and
    the dangling mass alternates with the rank update through
    half-steps so each is evaluated once per round. For corpus-scale
    graphs (node state that does NOT fit a row) the former
    DataFrame-loop shape — edge list pre-partitioned by src, rank
    join + aggregate per round — is the one that scales (GraphX's
    partitioning strategy; see PAPERS.md GraphX, OSDI'14); graph_ppr
    keeps that shape on the product graph."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    li = c["lineitem"].select("l_suppkey", "l_orderkey")
    orders = c["orders"].select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    base = (
        edges.agg(
            F.collect_list(
                F.struct("src", "dst", F.col("w").cast("double").alias("w"))
            ).alias("ea")
        )
        # node universe (sorted distinct src ∪ dst), out-nodes, and
        # per-out-node out-weights, all derived from the edge array
        .withColumn(
            "na",
            F.expr(
                "array_sort(array_distinct(concat("
                "transform(ea, e -> e.src), transform(ea, e -> e.dst))))"
            ),
        )
        .withColumn(
            "oa", F.expr("array_sort(array_distinct(transform(ea, e -> e.src)))")
        )
        .withColumn(
            "ow",
            F.expr(
                "transform(oa, s -> aggregate(filter(ea, e -> e.src = s),"
                " CAST(0 AS DOUBLE), (a, e) -> a + e.w))"
            ),
        )
        .withColumn(
            "hasout", F.expr("transform(na, nd -> array_contains(oa, nd))")
        )
        # 1-row checkpoint: CollapseProject inlines single-use derived
        # array columns into downstream LAMBDAS, where "used once" in
        # the plan means "re-evaluated per element access" at runtime
        # (measured 2 s -> 75 s without the barriers); a materialized
        # attribute cannot be inlined
        .localCheckpoint()
    )
    one = (
        # per-node incoming edges as (src index, w/out_w(src)) pairs —
        # built from materialized attributes, then materialized itself
        # before the fold for the same CollapseProject reason
        base.withColumn(
            "ie",
            F.expr(
                "transform(na, nd -> transform(filter(ea, e -> e.dst = nd),"
                " e -> struct(array_position(na, e.src) AS si,"
                " e.w / element_at(ow, CAST(array_position(oa, e.src)"
                " AS INT)) AS wn)))"
            ),
        ).localCheckpoint()
    )
    n_half = 2 * PAGERANK_ITERS
    sol = one.withColumn(
        "uv",
        F.expr(
            f"""aggregate(
  sequence(1, {n_half}),
  named_struct('r', transform(na, x -> 1.0 / CAST(size(na) AS DOUBLE)),
               'dang', CAST(0 AS DOUBLE)),
  (acc, it) -> if(it % 2 = 1,
    named_struct(
      'r', acc.r,
      'dang', aggregate(sequence(1, size(na)), CAST(0 AS DOUBLE),
                (s, i) -> s + if(element_at(hasout, i),
                                 CAST(0 AS DOUBLE),
                                 element_at(acc.r, i)))),
    named_struct(
      'r', transform(sequence(1, size(na)), j ->
             (1.0 - {DAMPING}) / CAST(size(na) AS DOUBLE)
             + {DAMPING} * (
                 aggregate(element_at(ie, j), CAST(0 AS DOUBLE),
                   (s, p) -> s + element_at(acc.r, CAST(p.si AS INT))
                               * p.wn)
                 + acc.dang / CAST(size(na) AS DOUBLE))),
      'dang', acc.dang)))"""
        ),
    )
    return sol.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(na)), i -> struct("
                "element_at(na, i) AS node, element_at(uv.r, i) AS rank))"
            )
        ).alias("z")
    ).select(
        F.col("z.node").alias("node"), rnd(F.col("z.rank"), 6).alias("rank")
    )
