"""Wave 9: graph neighborhood analytics, BFS shortest paths, window
frame idioms, cohort LTV, and readability scoring.

Graph queries run over the nation trade graph (supplier nation →
customer nation via lineitem⋈orders), the same graph mr_pagerank and
graph_degree use, symmetrized to undirected where neighborhood
semantics need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

_EDGE_SQL = """
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
"""


def _directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src, dst) nation pairs with src ≠ dst."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    return (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized (a, b) adjacency — both directions present once.

    The directed edge list is checkpointed BEFORE symmetrization and the
    result is checkpointed again: every graph query references the edge
    frame from several plan branches (degree aggregates, both wedge-join
    sides), and without the cut each branch would replay the 4-table
    join — measured 17 exchanges for common-neighbors vs 4 after. At
    cluster scale this materialization is the persisted edge table every
    graph pipeline builds first."""
    e = _directed_edges(spark, sf_dir).localCheckpoint()
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint()
    )


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH e0 AS ({_EDGE_SQL}),
    und AS (SELECT src AS a, dst AS b FROM e0
            UNION SELECT dst, src FROM e0),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
    cn AS (SELECT x.a AS a, y.a AS b, CAST(COUNT(*) AS BIGINT) AS cn
           FROM und x JOIN und y ON x.b = y.b AND x.a < y.a
           GROUP BY 1, 2)
    SELECT cn.a, cn.b, cn.cn,
           FLOOR(CAST(cn.cn AS DOUBLE) / (da.d + db.d - cn.cn)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM cn JOIN deg da ON cn.a = da.a JOIN deg db ON cn.b = db.a
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-pair neighborhood similarity over the undirected trade
    graph: common-neighbor count and neighborhood Jaccard
    |N(a)∩N(b)| / (deg(a)+deg(b)−|N(a)∩N(b)|) — the link-prediction /
    "similar markets" primitive. Integer counts end-to-end; only the
    final ratio is floating, rounded identically.

    Scale: the wedge join (und ⋈ und on shared neighbor) is the
    textbook two-path enumeration — quadratic in the HOTTEST node's
    degree. At 100 TB you bound it exactly like the shingle index in
    dd_ngram_jaccard: drop/bucket super-nodes above a degree cap
    before the self-join (degree-ordered orientation already halves
    the wedge count via a < b)."""
    und = _undirected_edges(spark, sf_dir)
    deg = und.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x = und.select(F.col("a").alias("xa"), F.col("b").alias("nb"))
    y = und.select(F.col("a").alias("yb"), F.col("b").alias("nb"))
    cn = (
        x.join(y, "nb")
        .filter(F.col("xa") < F.col("yb"))
        .groupBy(F.col("xa").alias("a"), F.col("yb").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    da = deg.select(F.col("a").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("a").alias("b"), F.col("d").alias("db"))
    return (
        cn.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "cn",
            ratio(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn"))
            ).alias("jaccard"),
        )
    )


BFS_SOURCE = 0
BFS_MAX_HOPS = 6


@query(
    "graph_bfs",
    # Real oracle: BFS min-hop distance is a textbook recursive CTE —
    # enumerate (node, hops) pairs up to the hop cap with UNION
    # (distinct) recursion, then MIN(hops) per node. Integer output,
    # so no cross-engine float risk at all. Helper CTEs avoid
    # top-level UNION (WITH RECURSIVE parsing quirk): DISTINCT over
    # UNION ALL.
    oracle=f"""
    WITH RECURSIVE de AS (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
    ),
    und AS (SELECT DISTINCT a, b FROM (
              SELECT src AS a, dst AS b FROM de
              UNION ALL SELECT dst, src FROM de)),
    bfs AS (
      SELECT {BFS_SOURCE} AS node, 0 AS hops
      UNION
      SELECT u.b, bfs.hops + 1
      FROM bfs JOIN und u ON u.a = bfs.node
      WHERE bfs.hops < {BFS_MAX_HOPS}
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(hops) AS BIGINT) AS hops
    FROM bfs GROUP BY node
    """,
)
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted single-source shortest hop counts from nation
    {BFS_SOURCE} over the undirected trade graph — Pregel-style
    iterative frontier expansion: each round joins the current frontier
    to the adjacency list, anti-joins already-visited nodes, and tags
    the survivors with hop+1. Terminates when the frontier empties or
    at {BFS_MAX_HOPS} hops.

    Scale: per round = one join keyed on node + one anti-join — the
    visited set and frontier are node-sized frames, never collected;
    localCheckpoint cuts the per-round lineage (same discipline as
    mr_pagerank). Edge list checkpointed once and reused every round."""
    und = _undirected_edges(spark, sf_dir).localCheckpoint()
    spark_ = spark
    visited = spark_.createDataFrame([(BFS_SOURCE, 0)], "node int, hops int")
    frontier = visited
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    return visited.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("hops").cast("bigint").alias("hops"),
    )


@query(
    "w_first_last_nth",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment,
             FIRST_VALUE(c_custkey) OVER w AS poorest,
             LAST_VALUE(c_custkey) OVER w AS richest,
             NTH_VALUE(c_custkey, 3) OVER w AS third_poorest,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT c_mktsegment, poorest, richest, third_poorest FROM r WHERE rn = 1
    """,
)
def w_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit
    whole-partition frame — the frame-idiom trap query: last_value
    under the DEFAULT frame (unbounded preceding → current row) returns
    the current row, so the explicit both-unbounded frame is the part
    users get wrong. Deterministic ordering via the (balance, custkey)
    composite.

    Scale: one shuffle on the segment key; all four window functions
    share a single sort."""
    cust = cat(spark, sf_dir)["customer"]
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wr = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    r = cust.select(
        "c_mktsegment",
        F.first_value("c_custkey").over(w).alias("poorest"),
        F.last_value("c_custkey").over(w).alias("richest"),
        F.nth_value("c_custkey", 3).over(w).alias("third_poorest"),
        F.row_number().over(wr).alias("rn"),
    )
    return r.filter(F.col("rn") == 1).drop("rn")


@query(
    "ev_cohort_ltv",
    oracle="""
    WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort
               FROM events GROUP BY 1),
    p AS (SELECT e.user_id,
                 date_diff('day', f.cohort, date_trunc('day', e.ts))
                   AS offset_d,
                 f.cohort,
                 CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS vc
          FROM events e JOIN f ON e.user_id = f.user_id
          WHERE e.event_type = 'purchase'),
    g AS (SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
                 CAST(offset_d AS BIGINT) AS offset_d,
                 SUM(vc) AS vc,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS buyers
          FROM p GROUP BY 1, 2)
    SELECT cohort_day, offset_d, buyers,
           FLOOR(CAST(SUM(vc) OVER (PARTITION BY cohort_day ORDER BY offset_d)
                      AS DOUBLE) / 100 * 100 + 0.5) / 100 AS cum_ltv
    FROM g
    """,
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users grouped by first-seen day, purchase
    value accumulated by day offset since joining — the "how much is a
    day-N user worth" curve growth teams steer by. Values go to integer
    cents BEFORE any summation, so the cumulative window is exact
    64-bit arithmetic in both engines (float cumsum order would drift).

    Scale: first-seen is one shuffle on user_id; the enrichment join
    rides the same key; the triangle itself is (cohorts × offsets)
    rows — tiny — so its cumulative window costs nothing. AQE picks
    broadcast for the first-seen side when it fits."""
    ev = cat(spark, sf_dir)["events"]
    f = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .select(
            "user_id",
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.date_trunc("day", "ts"), "cohort")
            .cast("bigint")
            .alias("offset_d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
        )
    )
    g = p.groupBy("cohort_day", "offset_d").agg(
        F.sum("vc").alias("vc"),
        F.countDistinct("user_id").cast("bigint").alias("buyers"),
    )
    wc = (
        W.partitionBy("cohort_day")
        .orderBy("offset_d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "cohort_day",
        "offset_d",
        "buyers",
        money(F.sum("vc").over(wc).cast("double") / 100).alias("cum_ltv"),
    )


@query(
    "tx_readability",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({DUCK_TOKENS}) AS DOUBLE) AS w,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS sents,
             CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  AS DOUBLE) AS syl
      FROM documents)
    SELECT doc_id, CAST(w AS BIGINT) AS n_words,
           CAST(sents AS BIGINT) AS n_sentences,
           CAST(syl AS BIGINT) AS n_syllables,
           FLOOR((0.39 * (w / sents) + 11.8 * (syl / w) - 15.59)
                 * 10000 + 0.5) / 10000 AS fk_grade
    FROM s WHERE w >= 1
    """,
)
def tx_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid-style readability grade per document with a
    vowel-group syllable proxy (the standard heuristic when no
    pronunciation dict ships with the pipeline) — a text-quality
    feature complementing tx_quality/tx_gopher_quality. The regex
    classes ([.!?]+ sentence enders, [aeiouy]+ vowel runs) behave
    identically in Java and RE2-style engines, so counts match exactly.

    Scale: pure narrow map — three regex scans per row, no shuffle at
    all; Catalyst keeps it in one WholeStageCodegen span over the
    parquet scan."""
    docs = cat(spark, sf_dir)["documents"]
    w = F.size(tokens()).cast("double")
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    ).cast("double")
    syl = F.size(
        F.regexp_extract_all("text", F.lit("[aeiouyAEIOUY]+"), 0)
    ).cast("double")
    s = docs.select(
        "doc_id", w.alias("w"), sents.alias("sents"), syl.alias("syl")
    ).filter(F.col("w") >= 1)
    return s.select(
        "doc_id",
        F.col("w").cast("bigint").alias("n_words"),
        F.col("sents").cast("bigint").alias("n_sentences"),
        F.col("syl").cast("bigint").alias("n_syllables"),
        ratio(
            0.39 * (F.col("w") / F.col("sents"))
            + 11.8 * (F.col("syl") / F.col("w"))
            - 15.59
        ).alias("fk_grade"),
    )
