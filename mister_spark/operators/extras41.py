"""Wave 41: randomness testing, feature screening, distributional
source distance, and degree assortativity.

stat_runs_test is the Wald–Wolfowitz check that a daily metric's
up/down moves are actually random (autocorrelated moves break naive
A/B assumptions); ml_feature_screen is the univariate correlation
filter that ranks embedding dimensions before any model training;
tx_js_divergence upgrades source comparison from vocabulary overlap
(Jaccard, tx_source_vocab_overlap) to full distributional distance;
graph_assortativity is Newman's degree-mixing coefficient — the one
number that says whether hubs link to hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
FS_POS_LABEL_LT = 5  # mirrors ml_auc / ml_pr_auc / ml_lift_table
FS_GRID = 1_000_000  # embedding values snapped to a 1e-6 grid
JS_GRID = 100_000_000  # per-term JS contributions snapped to a 1e-8 grid


@query(
    "stat_runs_test",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
               FROM events GROUP BY 1),
    m AS (SELECT day, vc,
                 CASE WHEN vc > lag(vc) OVER (ORDER BY day) THEN 1
                      WHEN vc < lag(vc) OVER (ORDER BY day) THEN -1
                      ELSE NULL END AS mv
          FROM d),
    s AS (SELECT day, mv,
                 CASE WHEN mv <> lag(mv) OVER (ORDER BY day) OR
                           lag(mv) OVER (ORDER BY day) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM m WHERE mv IS NOT NULL),
    a AS (SELECT CAST(SUM(CASE WHEN mv = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
                 CAST(SUM(CASE WHEN mv = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
                 CAST(SUM(brk) AS BIGINT) AS n_runs
          FROM s)
    SELECT n_up, n_down, n_runs,
           FLOOR((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1))
                 / SQRT(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n_up - n_down)
                        / ((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1.0)))
                 * 10000 + 0.5) / 10000 AS z
    FROM a
    """,
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily-revenue move sequence:
    code each day +1/−1 vs the previous day (flat days drop), count
    maximal same-sign runs, and z-score the count against the
    random-ordering expectation μ = 2n₁n₂/(n₁+n₂)+1. |z| > 1.96 means
    the ups and downs cluster (momentum/mean-reversion) — the cheap
    randomness sanity check before trusting any independence-assuming
    statistic on the series. Moves are exact integer-cent comparisons;
    the one float is the final z.

    Scale: one daily partial-agg rollup; both lag windows ride the
    #days grid frame (calendar-bounded — partition by month + carry
    at multi-year spans, as ev_slo_burn_rate notes)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.select(F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"), "value")
        .groupBy("day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
    )
    w = W.orderBy("day")
    m = d.select(
        "day",
        F.when(F.col("vc") > F.lag("vc").over(w), 1)
        .when(F.col("vc") < F.lag("vc").over(w), -1)
        .alias("mv"),
    ).filter(F.col("mv").isNotNull())
    s = m.select(
        "mv",
        F.when(
            (F.col("mv") != F.lag("mv").over(w)) | F.lag("mv").over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    a = s.agg(
        F.sum(F.when(F.col("mv") == 1, 1).otherwise(0)).cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("mv") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
        F.sum("brk").cast("bigint").alias("n_runs"),
    )
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return a.select(
        "n_up", "n_down", "n_runs", ratio((r - mu) / F.sqrt(var)).alias("z")
    )


@query(
    "ml_feature_screen",
    oracle=f"""
    WITH x AS (SELECT CAST(FLOOR(CAST(embedding[g.d] AS DOUBLE)
                                 * {FS_GRID} + 0.5) AS BIGINT) AS v,
                      g.d AS dim,
                      CASE WHEN label < {FS_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings
               CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) g),
    s AS (SELECT dim,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(v * v) AS BIGINT) AS svv,
                 CAST(SUM(v * pos) AS BIGINT) AS svp,
                 CAST(SUM(pos) AS BIGINT) AS np
          FROM x GROUP BY 1)
    SELECT CAST(dim AS BIGINT) AS dim,
           FLOOR((CAST(n AS DOUBLE) * svp - CAST(sv AS DOUBLE) * np)
                 / SQRT((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
                        * (CAST(n AS DOUBLE) * np - CAST(np AS DOUBLE) * np))
                 * 10000 + 0.5) / 10000 AS corr
    FROM s
    """,
)
def ml_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate feature screening: point-biserial correlation of
    every embedding dimension against the binary class — the filter
    step that ranks 64 candidate features before any model sees them
    (cheap, embarrassingly parallel, and what you run FIRST on a new
    feature store). Values snap to a 1e-6 integer grid so all five
    moment sums are exact int64 and engine summation order is moot;
    the one float is the final correlation.

    Scale: a narrow ×64 fan-out then ONE partial-agg shuffle on 64
    dim keys; int64 headroom: grid² · rows = 1e12 · n, safe beyond
    10⁶ rows per dim — drop to a 1e-5 grid past that."""
    emb = cat(spark, sf_dir)["embeddings"]
    x = emb.select(
        F.when(F.col("label") < FS_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("dim"),
                        F.floor(
                            F.element_at("embedding", i).cast("double") * FS_GRID
                            + F.lit(0.5)
                        )
                        .cast("bigint")
                        .alias("v"),
                    )
                    for i in range(1, 65)
                ]
            )
        ).alias("e"),
    ).select("pos", "e.dim", "e.v")
    s = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
        F.sum(F.col("v") * F.col("pos")).cast("bigint").alias("svp"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    n, sv, svv, svp, np_ = (
        F.col("n").cast("double"),
        F.col("sv").cast("double"),
        F.col("svv").cast("double"),
        F.col("svp").cast("double"),
        F.col("np").cast("double"),
    )
    corr = (n * svp - sv * np_) / F.sqrt((n * svv - sv * sv) * (n * np_ - np_ * np_))
    return s.select(
        F.col("dim").cast("bigint").alias("dim"), ratio(corr).alias("corr")
    )


@query(
    "tx_js_divergence",
    oracle=f"""
    WITH tk AS (SELECT source, unnest({DUCK_TOKENS}) AS tok
                FROM documents),
    g AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
          FROM tk GROUP BY 1, 2),
    t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nt FROM g GROUP BY 1),
    j AS (SELECT a.source AS src_a, b.source AS src_b,
                 a.n AS na, b.n AS nb, ta.nt AS nta, tb.nt AS ntb
          FROM g a JOIN g b ON a.tok = b.tok AND a.source < b.source
          JOIN t ta ON ta.source = a.source
          JOIN t tb ON tb.source = b.source),
    p AS (SELECT src_a, src_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_types,
                 CAST(SUM(na) AS BIGINT) AS sa,
                 CAST(SUM(nb) AS BIGINT) AS sb,
                 CAST(SUM(CAST(FLOOR((CAST(na AS DOUBLE) / nta)
                       * ln(2.0 * (CAST(na AS DOUBLE) / nta)
                            / (CAST(na AS DOUBLE) / nta
                               + CAST(nb AS DOUBLE) / ntb))
                       * {JS_GRID} + 0.5) AS BIGINT)) AS BIGINT) AS terma,
                 CAST(SUM(CAST(FLOOR((CAST(nb AS DOUBLE) / ntb)
                       * ln(2.0 * (CAST(nb AS DOUBLE) / ntb)
                            / (CAST(na AS DOUBLE) / nta
                               + CAST(nb AS DOUBLE) / ntb))
                       * {JS_GRID} + 0.5) AS BIGINT)) AS BIGINT) AS termb,
                 MAX(nta) AS nta, MAX(ntb) AS ntb
          FROM j GROUP BY 1, 2)
    SELECT src_a, src_b, shared_types,
           FLOOR((0.5 * (CAST(terma AS DOUBLE) / {JS_GRID}
                         + (1.0 - CAST(sa AS DOUBLE) / nta) * ln(2.0))
                  + 0.5 * (CAST(termb AS DOUBLE) / {JS_GRID}
                           + (1.0 - CAST(sb AS DOUBLE) / ntb) * ln(2.0)))
                 * 10000 + 0.5) / 10000 AS js
    FROM p
    """,
)
def tx_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between source unigram
    distributions — the distributional upgrade of
    tx_source_vocab_overlap's set Jaccard: two sources can share every
    token yet use them at wildly different rates, and JS (bounded
    [0, ln 2], symmetric, finite on disjoint support) is the standard
    corpus-mix distance. Shared-token terms p·ln(2p/(p+q)) snap to a
    1e-8 grid before summation; each side's EXCLUSIVE mass enters in
    closed form as (1−shared_mass)·ln2, with shared mass an exact
    integer count ratio — no per-token pass over exclusive vocab.

    Scale: one (source, token) partial-agg shuffle; the pair join is
    token-keyed with fan-out ≤ #sources² per token (tx_source_vocab_
    overlap's bound); output is #source-pairs rows."""
    docs = cat(spark, sf_dir)["documents"]
    tk = docs.select("source", F.explode(tokens()).alias("tok"))
    g = tk.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint()
    t = g.groupBy("source").agg(F.sum("n").cast("bigint").alias("nt"))
    a = g.select(F.col("source").alias("src_a"), "tok", F.col("n").alias("na"))
    b = g.select(F.col("source").alias("src_b"), "tok", F.col("n").alias("nb"))
    ta = t.select(F.col("source").alias("src_a"), F.col("nt").alias("nta"))
    tb = t.select(F.col("source").alias("src_b"), F.col("nt").alias("ntb"))
    j = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
    )
    pa = F.col("na").cast("double") / F.col("nta")
    pb = F.col("nb").cast("double") / F.col("ntb")
    term = lambda p, q: F.floor(
        p * F.log(2.0 * p / (p + q)) * JS_GRID + F.lit(0.5)
    ).cast("bigint")
    p = j.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared_types"),
        F.sum("na").cast("bigint").alias("sa"),
        F.sum("nb").cast("bigint").alias("sb"),
        F.sum(term(pa, pb)).cast("bigint").alias("terma"),
        F.sum(term(pb, pa)).cast("bigint").alias("termb"),
        F.max("nta").alias("nta"),
        F.max("ntb").alias("ntb"),
    )
    ln2 = float(__import__("math").log(2.0))
    js = 0.5 * (
        F.col("terma").cast("double") / JS_GRID
        + (1.0 - F.col("sa").cast("double") / F.col("nta")) * ln2
    ) + 0.5 * (
        F.col("termb").cast("double") / JS_GRID
        + (1.0 - F.col("sb").cast("double") / F.col("ntb")) * ln2
    )
    return p.select("src_a", "src_b", "shared_types", ratio(js).alias("js"))


@query(
    "graph_assortativity",
    oracle="""
    WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS lo,
                      greatest(c.c_nationkey, s.s_nationkey) AS hi,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               WHERE c.c_nationkey <> s.s_nationkey
               GROUP BY 1, 2),
    mu AS (SELECT SUM(CAST(cnt AS DOUBLE)) / COUNT(*) AS avg_cnt FROM p),
    e AS (SELECT lo, hi FROM p, mu WHERE CAST(cnt AS DOUBLE) > mu.avg_cnt),
    d AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT lo AS x FROM e UNION ALL SELECT hi FROM e)
          GROUP BY 1),
    z AS (SELECT dl.deg AS j, dh.deg AS k
          FROM e JOIN d dl ON e.lo = dl.x JOIN d dh ON e.hi = dh.x),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(j * k) AS BIGINT) AS s1,
                 CAST(SUM(j + k) AS BIGINT) AS s2,
                 CAST(SUM(j * j + k * k) AS BIGINT) AS s3
          FROM z)
    SELECT m AS n_edges,
           FLOOR((4.0 * m * s1 - CAST(s2 AS DOUBLE) * s2)
                 / (2.0 * m * s3 - CAST(s2 AS DOUBLE) * s2)
                 * 10000 + 0.5) / 10000 AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the HEAVY-trade nation graph
    (edges = nation pairs with above-mean lineitem volume — the raw
    trade graph saturates to a complete graph, where every degree is
    equal and the coefficient is undefined; thresholding at the mean
    keeps the economically meaningful half): the Pearson correlation
    of endpoint degrees over edges — positive means hubs trade with
    hubs (resilient core), negative a hub-and-spoke structure (the
    shape that makes graph shuffles skew; graph_degree shows the
    histogram, this is its one-number summary). All three sums are
    exact int64 over integer degrees; one division at the end.

    Scale: edge derivation is the graph_triangles join around one fact
    scan, collapsed to pair counts before the 1-row mean broadcast;
    degrees are one partial-agg shuffle over node keys; the two degree
    joins are node-keyed (broadcast here, shuffle-join on web-scale
    graphs)."""
    c = cat(spark, sf_dir)
    li, orders = c["lineitem"], c["orders"]
    cust, supp = c["customer"], c["supplier"]
    p = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("lo"),
            F.greatest("c_nationkey", "s_nationkey").alias("hi"),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # four branches (mean, degree rollup, two endpoint joins) read
        # the 4-table pair derivation — cut the lineage once
        .localCheckpoint()
    )
    mu = p.agg(
        (F.sum(F.col("cnt").cast("double")) / F.count(F.lit(1))).alias("avg_cnt")
    )
    e = (
        p.crossJoin(F.broadcast(mu))
        .filter(F.col("cnt").cast("double") > F.col("avg_cnt"))
        .select("lo", "hi")
    )
    d = (
        e.select(F.col("lo").alias("x"))
        .union(e.select("hi"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    dl = d.select(F.col("x").alias("lo"), F.col("deg").alias("j"))
    dh = d.select(F.col("x").alias("hi"), F.col("deg").alias("k"))
    z = e.join(F.broadcast(dl), "lo").join(F.broadcast(dh), "hi")
    s = z.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("s1"),
        F.sum(F.col("j") + F.col("k")).cast("bigint").alias("s2"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("bigint")
        .alias("s3"),
    )
    m, s1, s2, s3 = (
        F.col("m"),
        F.col("s1"),
        F.col("s2").cast("double"),
        F.col("s3"),
    )
    return s.select(
        F.col("m").alias("n_edges"),
        ratio((4.0 * m * s1 - s2 * s2) / (2.0 * m * s3 - s2 * s2)).alias(
            "assortativity"
        ),
    )
