"""Wave 235: core-periphery structure and memorization-risk tiers.

graph_core_periphery fits the Borgatti-Everett discrete model to the
trade graph: rank nations by degree, sweep every core-size cut, and
score each cut by core density minus periphery density — the best
cut SAYS whether the network is a dense club with hangers-on (fit
near 1) or has no core at all (fit near 0), with the sweep done in
closed form from two rank-cumulative edge histograms instead of
n^2/2 recounts. k-core gives each node a number; this fits the
GLOBAL two-block story. ds_memorization_risk converts duplication
into the risk language an LLM-training review wants: documents in
larger exact-duplicate groups are empirically likelier to be
memorized verbatim, so the corpus is tiered (unique / few-copies /
many-copies) with per-tier shares, token mass and EXCESS copies —
the number of redundant documents a dedup pass would delete and the
memorization exposure a privacy review prices.

Exactness: ranks, cut histograms and densities are integers and
their ratios; dup-group sizes and token counts are integers off the
exact text grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

MEM_LOW_MAX = 3  # copies 2..3 = low tier; >= 4 = high tier


@query(
    "graph_core_periphery",
    # Real oracle: degree ranks with full tiebreaks, per-cut
    # core/periphery edge counts from cumulative max/min-rank
    # histograms (pure integers), densities as integer ratios, and
    # the best cut an argmax on the rounded fit with smallest-cut
    # tiebreak.
    oracle="""
    WITH e0 AS (SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey)
                       AS a,
                       GREATEST(s.s_nationkey, c.c_nationkey) AS b
                FROM lineitem l JOIN orders o
                     ON l.l_orderkey = o.o_orderkey
                     JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     JOIN customer c ON o.o_custkey = c.c_custkey
                WHERE s.s_nationkey <> c.c_nationkey),
    sym AS (SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
    nodes AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, u)
                       AS rk
              FROM sym GROUP BY u),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    er AS (SELECT GREATEST(ra.rk, rb.rk) AS mx,
                  LEAST(ra.rk, rb.rk) AS mn
           FROM e0 JOIN nodes ra ON ra.node = e0.a
                JOIN nodes rb ON rb.node = e0.b),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM er),
    cuts AS (SELECT c FROM (SELECT unnest(generate_series(2,
                    (SELECT CAST(n - 1 AS INT) FROM n))) AS c)),
    sweep AS (SELECT cuts.c,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM er
                      WHERE er.mx <= cuts.c) AS ecc,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM er
                      WHERE er.mn > cuts.c) AS epp
              FROM cuts),
    fit AS (SELECT sweep.c, sweep.ecc, sweep.epp, n.n,
                   CAST(sweep.ecc AS DOUBLE)
                     / (sweep.c * (sweep.c - 1) / 2.0)
                   - CAST(sweep.epp AS DOUBLE)
                     / GREATEST((n.n - sweep.c) * (n.n - sweep.c - 1)
                                / 2.0, 1.0) AS f
            FROM sweep, n),
    best AS (SELECT * FROM fit
             ORDER BY FLOOR(f * 1e6 + 0.5) DESC, c LIMIT 1)
    SELECT n.n AS n_nodes, m.m AS n_edges,
           CAST(best.c AS BIGINT) AS core_size,
           FLOOR(CAST(best.ecc AS DOUBLE)
                 / (best.c * (best.c - 1) / 2.0) * 1e4 + 0.5) / 1e4
             AS core_density,
           FLOOR(CAST(best.epp AS DOUBLE)
                 / GREATEST((n.n - best.c) * (n.n - best.c - 1) / 2.0,
                            1.0) * 1e4 + 0.5) / 1e4
             AS periphery_density,
           FLOOR(best.f * 1e4 + 0.5) / 1e4 AS fit
    FROM best, n, m
    """,
)
def graph_core_periphery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borgatti-Everett core-periphery fit of the trade graph: sweep
    every core size over the degree ranking and score core density
    minus periphery density — each cut's edge counts read off two
    cumulative rank histograms (an edge is core-core for every cut
    >= its larger endpoint rank; periphery-periphery below its
    smaller), so the whole sweep is O(edges + cuts), not O(n * m).
    fit near 1 = a dense club serving spokes; near 0 = no
    center-vs-edge story at all. The global structure statement
    graph_k_core's per-node shells only imply.

    Scale: the one fact-scan shuffle builds the edge list; ranks,
    histograms and the sweep live on the dimension-bounded frame."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("sn"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("cn"))
    e0 = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("sn") != F.col("cn"))
        .select(
            F.least("sn", "cn").alias("a"), F.greatest("sn", "cn").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    sym = e0.select(F.col("a").alias("u")).unionByName(
        e0.select(F.col("b").alias("u"))
    )
    nodes = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .select(
            F.col("u").alias("node"), "deg",
            F.row_number()
            .over(W.orderBy(F.col("deg").desc(), "u"))
            .alias("rk"),
        )
        .localCheckpoint()  # dimension-bounded rank frame
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    er = (
        e0.join(nodes.select(F.col("node").alias("a"), F.col("rk").alias("ra")), "a")
        .join(nodes.select(F.col("node").alias("b"), F.col("rk").alias("rb")), "b")
        .select(
            F.greatest("ra", "rb").alias("mx"), F.least("ra", "rb").alias("mn")
        )
        .localCheckpoint()
    )
    m = er.agg(F.count(F.lit(1)).alias("m"))
    nmax = n.collect()[0]["n"]
    cuts = spark.range(2, int(nmax)).select(F.col("id").alias("c"))
    ecc = (
        cuts.join(F.broadcast(er), F.col("mx") <= F.col("c"), "left")
        .groupBy("c")
        .agg(F.count(F.col("mx")).cast("bigint").alias("ecc"))
    )
    epp = (
        cuts.join(F.broadcast(er), F.col("mn") > F.col("c"), "left")
        .groupBy("c")
        .agg(F.count(F.col("mn")).cast("bigint").alias("epp"))
    )
    fit_val = (
        F.col("ecc").cast("double") / (F.col("c") * (F.col("c") - 1) / 2.0)
        - F.col("epp").cast("double")
        / F.greatest(
            (F.col("n") - F.col("c")) * (F.col("n") - F.col("c") - 1) / 2.0,
            F.lit(1.0),
        )
    )
    sweep = (
        ecc.join(epp, "c")
        .crossJoin(F.broadcast(n))
        .select("c", "ecc", "epp", "n", fit_val.alias("f"))
    )
    best = sweep.orderBy(F.floor(F.col("f") * 1e6 + 0.5).desc(), "c").limit(1)
    return best.crossJoin(F.broadcast(m)).select(
        F.col("n").cast("bigint").alias("n_nodes"),
        F.col("m").cast("bigint").alias("n_edges"),
        F.col("c").cast("bigint").alias("core_size"),
        rnd(
            F.col("ecc").cast("double") / (F.col("c") * (F.col("c") - 1) / 2.0),
            4,
        ).alias("core_density"),
        rnd(
            F.col("epp").cast("double")
            / F.greatest(
                (F.col("n") - F.col("c")) * (F.col("n") - F.col("c") - 1) / 2.0,
                F.lit(1.0),
            ),
            4,
        ).alias("periphery_density"),
        rnd(F.col("f"), 4).alias("fit"),
    )


@query(
    "ds_memorization_risk",
    # Real oracle: exact-text dup groups, integer group sizes and
    # token counts, tier shares as integer ratios on the grid.
    oracle=f"""
    WITH g AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS copies,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS toks
               FROM documents GROUP BY text),
    t AS (SELECT CASE WHEN copies = 1 THEN 'unique'
                      WHEN copies <= {MEM_LOW_MAX} THEN 'low'
                      ELSE 'high' END AS tier,
                 copies, toks
          FROM g),
    n AS (SELECT CAST(SUM(copies) AS DOUBLE) AS n_docs FROM t),
    agg AS (SELECT tier,
                   CAST(SUM(copies) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(copies - 1) AS BIGINT) AS excess_copies,
                   SUM(CAST(copies AS DOUBLE) * toks) AS tok_mass
            FROM t GROUP BY 1)
    SELECT agg.tier, agg.n_docs, agg.n_groups, agg.excess_copies,
           FLOOR(agg.n_docs / n.n_docs * 1e4 + 0.5) / 1e4 AS pct_docs,
           FLOOR(agg.tok_mass / agg.n_docs * 100 + 0.5) / 100
             AS avg_tokens
    FROM agg, n
    """,
)
def ds_memorization_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk tiers from exact duplication: documents in
    bigger duplicate groups are empirically likelier to be emitted
    verbatim by a model trained on them, so the corpus is tiered
    unique / low (2-{lm} copies) / high (more) with per-tier doc
    share, average length and EXCESS copies (what a dedup pass would
    delete). The privacy-review one-pager: how much of the corpus
    sits in the memorization danger zone, and how many tokens of it
    are pure redundancy (dd_exact finds the groups; this prices
    them).

    Scale: one exact-text grouping (the dd_exact shuffle) + a 3-row
    tier rollup; map-side combinable after the group."""
    g = (
        cat(spark, sf_dir)["documents"]
        .groupBy("text")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("copies"),
            F.first(F.size(tokens())).cast("bigint").alias("toks"),
        )
    )
    t = g.select(
        F.when(F.col("copies") == 1, "unique")
        .when(F.col("copies") <= MEM_LOW_MAX, "low")
        .otherwise("high")
        .alias("tier"),
        "copies", "toks",
    ).localCheckpoint()
    n = t.agg(F.sum("copies").cast("double").alias("n_docs_t"))
    agg = t.groupBy("tier").agg(
        F.sum("copies").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.col("copies") - 1).cast("bigint").alias("excess_copies"),
        F.sum(F.col("copies").cast("double") * F.col("toks")).alias(
            "tok_mass"
        ),
    )
    return agg.crossJoin(F.broadcast(n)).select(
        "tier", "n_docs", "n_groups", "excess_copies",
        rnd(F.col("n_docs") / F.col("n_docs_t"), 4).alias("pct_docs"),
        rnd(F.col("tok_mass") / F.col("n_docs"), 2).alias("avg_tokens"),
    )


ds_memorization_risk.__doc__ = ds_memorization_risk.__doc__.format(
    lm=MEM_LOW_MAX
)
