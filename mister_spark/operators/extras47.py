"""Wave 47: graph analytics — connected components, neighborhood
similarity, reciprocity, and co-purchase edge mining.

graph_copurchase derives the classic market-basket graph (parts bought
together); graph_components runs hash-to-min + pointer-jumping
connected components over it — the O(log n)-round distributed CC that
label propagation alone (dd_clusters' candidate-pair variant) doesn't
give you; graph_jaccard_neighbors ranks structurally-equivalent node
pairs (the link-prediction baseline); graph_reciprocity measures how
bidirectional the directed trade flow is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

COP_SUPPORT = 3  # co-purchase edge: >= this many shared orders
COP_BASKET_CAP = 16  # per-order distinct parts bound (quadratic guard)
CC_MAX_ITERS = 10


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) with a deterministic per-basket cap of
    {COP_BASKET_CAP} parts (by partkey) so one pathological mega-order
    can't go quadratic."""
    li = cat(spark, sf_dir)["lineitem"]
    b = li.select("l_orderkey", "l_partkey").distinct()
    w = W.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        b.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= COP_BASKET_CAP)
        .drop("_rk")
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one order-keyed aggregation builds the capped basket ARRAY
    # (collect_set dedupes map-side; sorted slice = the window cap's
    # 16 smallest partkeys), and the p1 < p2 pairs are enumerated
    # JVM-side from the sorted array — the former shape paid a
    # distinct exchange + a window exchange/sort + a basket self-join
    # for the same ≤ C(16,2) pairs per order (guide §2.3/§2.4; the
    # ml_apriori_itemsets pattern)
    li = cat(spark, sf_dir)["lineitem"]
    ba = li.groupBy("l_orderkey").agg(
        F.slice(
            F.array_sort(F.collect_set("l_partkey")), 1, COP_BASKET_CAP
        ).alias("ps")
    )
    pairs = ba.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> transform("
                "slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("e")
    )
    return (
        pairs.select("e.p1", "e.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .filter(F.col("w") >= COP_SUPPORT)
    )


_DUCK_BASKETS = f"""
      raw AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      bk AS (SELECT l_orderkey, l_partkey FROM (
               SELECT l_orderkey, l_partkey,
                      ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                         ORDER BY l_partkey) AS rk
               FROM raw) WHERE rk <= {COP_BASKET_CAP})
"""

# Symmetrized support-thresholded co-purchase edges as a shareable CTE
# block (csym has both directions of every edge) — the DuckDB twin of
# _copurchase_edges for the iterative-graph oracles. Deliberately no
# top-level UNION in any CTE body: under WITH RECURSIVE, DuckDB 1.0
# parses `a UNION b` CTE bodies as union-CTEs and skips the dedup, so
# dedup is spelled DISTINCT-over-UNION-ALL.
DUCK_COPURCHASE_SYM = f"""{_DUCK_BASKETS},
      ce AS (SELECT p1, p2 FROM (
               SELECT x.l_partkey AS p1, y.l_partkey AS p2, COUNT(*) AS w
               FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                                  AND x.l_partkey < y.l_partkey
               GROUP BY 1, 2) WHERE w >= {COP_SUPPORT}),
      csym AS (SELECT DISTINCT p1, p2 FROM (
                 SELECT p1, p2 FROM ce
                 UNION ALL SELECT p2, p1 FROM ce))
"""


@query(
    "graph_copurchase",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT})
    SELECT p1, p2, w FROM e ORDER BY w DESC, p1, p2 LIMIT 20
    """,
)
def graph_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase edges: parts appearing together in ≥
    {COP_SUPPORT} orders, top-20 by shared-order count — the edge-mining
    step every 'customers also bought' graph starts from.

    Scale: ONE shuffle on orderkey co-locates each basket; the
    self-join is partition-local after that and the per-basket
    {COP_BASKET_CAP}-part cap bounds the quadratic blowup (a 10k-item
    order would otherwise emit 50M pairs); pair counts partial-agg
    map-side. Top-20 is a distributed TakeOrdered."""
    e = _copurchase_edges(spark, sf_dir)
    return e.orderBy(F.col("w").desc(), "p1", "p2").limit(20)


@query(
    "graph_components",
    # Real oracle: connected components via transitive-closure
    # reachability (UNION-distinct recursion), component label =
    # MIN(reachable id) — the converged fixpoint the Spark loop's
    # hash-to-min + pointer jumping reaches (pointer jumping covers
    # diameter 2^{CC_MAX_ITERS}; co-purchase components are tiny, so
    # both engines are at the true components). Integer output. The
    # closure is |component|² pairs — fine at oracle scale because
    # support-{COP_SUPPORT} co-purchase components stay small.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    reach AS (
      SELECT p1 AS node, p1 AS lab FROM csym
      UNION
      SELECT s.p2, r.lab FROM reach r JOIN csym s ON s.p1 = r.node
    ),
    lbl AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT CAST(component AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM lbl GROUP BY component
    ORDER BY n_nodes DESC, component LIMIT 20
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph (support ≥
    {COP_SUPPORT}) via hash-to-min with POINTER JUMPING: each round
    every node takes the min label in its neighborhood, then follows
    its label's label (path halving) — O(log n) rounds instead of
    O(diameter) for plain label propagation. Returns the 20 largest
    components (root = min partkey, size).

    Scale: each round is one edge-shuffle groupBy + one node-sized
    label join, localCheckpoint-ed (pagerank precedent) so the lineage
    doesn't stack; convergence is detected with an O(1) changed-count
    collect, capped at {CC_MAX_ITERS} rounds. No driver-side data
    structures beyond that scalar."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.unionByName(
        e.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).localCheckpoint()
    lab = (
        sym.select(F.col("p1").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            sym.join(lab.withColumnRenamed("node", "p1"), "p1")
            .groupBy(F.col("p2").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        upd = (
            lab.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
            )
        )
        # pointer jumping: follow my label's label
        parent = upd.select(
            F.col("node").alias("lab"), F.col("lab").alias("plab")
        )
        jumped = (
            upd.join(parent, "lab", "left")
            .select(
                "node",
                F.coalesce(F.col("plab"), F.col("lab")).alias("lab"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.join(lab.withColumnRenamed("lab", "old"), "node")
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        lab = jumped
        if changed == 0:
            break
    comp = lab.groupBy(F.col("lab").alias("component")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    return comp.orderBy(F.col("n_nodes").desc(), "component").limit(20)


_DUCK_TRADE_EDGES = """
      te AS (SELECT DISTINCT
               LEAST(c.c_nationkey, s.s_nationkey) AS lo,
               GREATEST(c.c_nationkey, s.s_nationkey) AS hi
             FROM lineitem l
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN supplier s ON l.l_suppkey = s.s_suppkey
             WHERE c.c_nationkey <> s.s_nationkey)
"""


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH {_DUCK_TRADE_EDGES},
    adj AS (SELECT lo AS x, hi AS n FROM te
            UNION ALL SELECT hi, lo FROM te),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
    com AS (SELECT a.x AS u, b.x AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM adj a JOIN adj b ON a.n = b.n AND a.x < b.x
            GROUP BY 1, 2),
    j AS (SELECT com.u, com.v, com.c, da.d AS du, dv.d AS dv,
                 FLOOR(CAST(com.c AS DOUBLE) / (da.d + dv.d - com.c)
                       * 10000 + 0.5) / 10000 AS jaccard
          FROM com JOIN deg da ON com.u = da.x
                   JOIN deg dv ON com.v = dv.x)
    SELECT u, v, c AS n_common, jaccard
    FROM j ORDER BY jaccard DESC, u, v LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity on the nation trade graph:
    J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| for every pair sharing ≥1
    neighbor, top-20 — the structural-equivalence score that is the
    standard link-prediction / role-detection baseline. Sorted on the
    ROUNDED score + (u,v) tiebreak so both engines pick identical rows.

    Scale: common-neighbor pairs come from the wedge join (adjacency
    self-joined on the shared neighbor) — linear in Σ deg², the same
    bound as graph_triangles, with partial-agg on (u,v); degrees are
    one tiny groupBy broadcast back."""
    c = cat(spark, sf_dir)
    li, orders = c["lineitem"], c["orders"]
    cust, supp = c["customer"], c["supplier"]
    te = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("lo"),
            F.greatest("c_nationkey", "s_nationkey").alias("hi"),
        )
        .distinct()
        .localCheckpoint()  # tiny edge list; feeds adjacency twice
    )
    adj = te.select(F.col("lo").alias("x"), F.col("hi").alias("n")).unionByName(
        te.select(F.col("hi").alias("x"), F.col("lo").alias("n"))
    )
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a = adj.select(F.col("x").alias("u"), "n")
    b = adj.select(F.col("x").alias("v"), "n")
    com = (
        a.join(b, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    j = (
        com.join(
            F.broadcast(deg.select(F.col("x").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            F.col("c").alias("n_common"),
            ratio(
                F.col("c").cast("double")
                / (F.col("du") + F.col("dv") - F.col("c"))
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.col("jaccard").desc(), "u", "v").limit(20)


@query(
    "graph_reciprocity",
    oracle="""
    WITH de AS (SELECT DISTINCT s.s_nationkey AS a, c.c_nationkey AS b
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                WHERE s.s_nationkey <> c.c_nationkey),
    r AS (SELECT de.a, de.b,
                 CASE WHEN rev.a IS NOT NULL THEN 1 ELSE 0 END AS m
          FROM de LEFT JOIN de rev ON de.a = rev.b AND de.b = rev.a)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(m) AS BIGINT) AS n_reciprocated,
           CAST(SUM(m) / 2 AS BIGINT) AS n_mutual_pairs,
           FLOOR(CAST(SUM(m) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS reciprocity
    FROM r
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the DIRECTED trade graph (supplier-nation →
    customer-nation): the fraction of edges whose reverse edge also
    exists — the first asymmetry diagnostic on any directed network
    (trade imbalance here; follow-back rate on a social graph).

    Scale: the distinct directed edge list is nation²-bounded (tiny)
    after one fact-table pass with broadcast dims; the reverse-edge
    check is a self-join on that model-sized frame."""
    c = cat(spark, sf_dir)
    li, orders = c["lineitem"], c["orders"]
    cust, supp = c["customer"], c["supplier"]
    de = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("a"), F.col("c_nationkey").alias("b")
        )
        .distinct()
        .localCheckpoint()  # nation^2-bounded; self-joined below
    )
    rev = de.select(F.col("b").alias("a"), F.col("a").alias("b"), F.lit(1).alias("_m"))
    r = de.join(rev, ["a", "b"], "left").select(
        F.coalesce(F.col("_m"), F.lit(0)).alias("m")
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum("m").cast("bigint").alias("n_reciprocated"),
        (F.sum("m") / 2).cast("bigint").alias("n_mutual_pairs"),
        ratio(F.sum("m").cast("double") / F.count(F.lit(1))).alias(
            "reciprocity"
        ),
    )
