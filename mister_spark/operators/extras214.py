"""Wave 214: directed-graph macro-structure and motif significance.

graph_scc_bowtie computes the strongly-connected-component
decomposition of the high-traffic trade network (nation -> nation
flows at or above the mean pair intensity) and classifies every node
into the web-graph BOW-TIE: the largest SCC as the core, IN = nodes
that can reach the core, OUT = nodes the core reaches, and the rest
— the macro-map of a directed system (who feeds the cycle, who only
drains it) that undirected graph_components cannot see.
graph_config_triangles scores the co-purchase graph's triangle count
against the configuration-model expectation (1/6)(S2/S1)^3 from the
degree sequence alone: the observed/expected ratio says whether
closure is a real clustering force or just what heavy-tailed degrees
produce by accident — the global yes/no behind graph_clustering_coeff.

Exactness: flows, thresholds (integer cross-multiplied mean compare),
reachability closures, SCC labels and all counts are pure integer
arithmetic; the config-model expectation is one closed-form ratio of
integer sums, rounded on the shared grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM, _copurchase_edges
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

SCC_DOUBLING_ROUNDS = 5  # reach doubling: covers path length 2^5


_DUCK_FLOW_EDGES = """
    flow AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                  JOIN customer c ON o.o_custkey = c.c_custkey
             WHERE s.s_nationkey <> c.c_nationkey
             GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS np FROM flow),
    e AS (SELECT src, dst FROM flow, tot WHERE cnt * np >= total)
"""


@query(
    "graph_scc_bowtie",
    # Real oracle: the kept-edge rule is an integer cross-multiplied
    # mean compare, reachability is a transitive-closure recursion,
    # SCC label = min mutual-reach partner, and every bow-tie bucket
    # is a COUNT over integer joins — no floats anywhere.
    oracle=f"""
    WITH RECURSIVE {_DUCK_FLOW_EDGES},
    reach AS (SELECT src AS u, dst AS v FROM e
              UNION
              SELECT r.u, e.dst FROM reach r JOIN e ON e.src = r.v),
    nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM e
                UNION ALL SELECT dst FROM e)),
    mut AS (SELECT a.u, a.v FROM reach a
            JOIN reach b ON b.u = a.v AND b.v = a.u),
    lbl AS (SELECT n.node,
                   LEAST(n.node, COALESCE(MIN(m.v), n.node)) AS scc
            FROM nodes n LEFT JOIN mut m ON m.u = n.node
            GROUP BY n.node),
    sz AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS size
           FROM lbl GROUP BY 1),
    core AS (SELECT scc AS core_lab, size AS core_size FROM sz
             ORDER BY size DESC, scc LIMIT 1),
    cls AS (SELECT l.node,
                   CASE WHEN l.scc = c.core_lab THEN 'core'
                        WHEN EXISTS (SELECT 1 FROM reach r
                                     WHERE r.u = l.node
                                       AND r.v = c.core_lab) THEN 'in'
                        WHEN EXISTS (SELECT 1 FROM reach r
                                     WHERE r.u = c.core_lab
                                       AND r.v = l.node) THEN 'out'
                        ELSE 'other' END AS part
            FROM lbl l, core c)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sz) AS n_scc,
           c.core_lab AS core_label, c.core_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cls
            WHERE part = 'in') AS in_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cls
            WHERE part = 'out') AS out_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cls
            WHERE part = 'other') AS other_size
    FROM core c
    """,
)
def graph_scc_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition of the high-traffic trade network: keep
    nation->nation flows with at least the mean pair intensity
    (integer cross-multiplied compare — no float threshold), close
    reachability by {rounds} doubling rounds (covers diameter 2^{rounds}),
    label SCCs as the min mutual-reach partner, and bucket every node
    as core / IN / OUT / other relative to the largest SCC. The
    directed macro-structure question — which markets sit inside the
    self-sustaining trade cycle, which only supply it, which only
    consume from it — that no undirected view can answer.

    Scale: flow aggregation is the one fact-scan shuffle; the nation
    graph is dimension-bounded (~25 nodes), so closure frames are
    model-sized. On a billion-node graph the same loop runs with
    hash-to-min labels instead of full closure (graph_components'
    pointer-jumping pattern) — the plan shape is identical, only the
    reach representation changes. Doubling is checkpointed per round."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    flow = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # nation^2-bounded; feeds threshold + edges
    )
    tot = flow.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("np")
    )
    e = (
        flow.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("np") >= F.col("total"))
        .select("src", "dst")
        .localCheckpoint()
    )
    r = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    for _ in range(SCC_DOUBLING_ROUNDS):
        ext = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.v") == F.col("b.u"))
            .select(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
        )
        r = r.unionByName(ext).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    mut = (
        r.alias("a")
        .join(
            r.alias("b"),
            (F.col("b.u") == F.col("a.v")) & (F.col("b.v") == F.col("a.u")),
        )
        .select(F.col("a.u").alias("u"), F.col("a.v").alias("v"))
    )
    lbl = (
        nodes.join(mut, nodes.node == mut.u, "left")
        .groupBy("node")
        .agg(
            F.least(
                F.col("node"), F.coalesce(F.min("v"), F.col("node"))
            ).alias("scc")
        )
        .localCheckpoint()  # feeds sizes + bow-tie classification
    )
    sz = lbl.groupBy("scc").agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    core = (
        sz.orderBy(F.col("size").desc(), "scc")
        .limit(1)
        .select(
            F.col("scc").alias("core_lab"), F.col("size").alias("core_size")
        )
    )
    rin = (
        r.join(F.broadcast(core), r.v == F.col("core_lab"))
        .select(F.col("u").alias("node"))
        .distinct()
        .withColumn("reaches_core", F.lit(1))
    )
    rout = (
        r.join(F.broadcast(core), r.u == F.col("core_lab"))
        .select(F.col("v").alias("node"))
        .distinct()
        .withColumn("core_reaches", F.lit(1))
    )
    cls = (
        lbl.crossJoin(F.broadcast(core))
        .join(F.broadcast(rin), "node", "left")
        .join(F.broadcast(rout), "node", "left")
        .select(
            "core_lab", "core_size",
            F.when(F.col("scc") == F.col("core_lab"), "core")
            .when(F.col("reaches_core") == 1, "in")
            .when(F.col("core_reaches") == 1, "out")
            .otherwise("other")
            .alias("part"),
        )
    )
    agg = cls.groupBy("core_lab", "core_size").agg(
        F.sum(F.when(F.col("part") == "in", 1).otherwise(0)).alias("in_size"),
        F.sum(F.when(F.col("part") == "out", 1).otherwise(0)).alias(
            "out_size"
        ),
        F.sum(F.when(F.col("part") == "other", 1).otherwise(0)).alias(
            "other_size"
        ),
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = e.agg(F.count(F.lit(1)).alias("n_edges_kept"))
    nscc = sz.agg(F.count(F.lit(1)).alias("n_scc"))
    return (
        n.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(nscc))
        .crossJoin(F.broadcast(agg))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges_kept").cast("bigint").alias("n_edges_kept"),
            F.col("n_scc").cast("bigint").alias("n_scc"),
            F.col("core_lab").cast("bigint").alias("core_label"),
            F.col("core_size").cast("bigint").alias("core_size"),
            F.col("in_size").cast("bigint").alias("in_size"),
            F.col("out_size").cast("bigint").alias("out_size"),
            F.col("other_size").cast("bigint").alias("other_size"),
        )
    )


graph_scc_bowtie.__doc__ = graph_scc_bowtie.__doc__.format(
    rounds=SCC_DOUBLING_ROUNDS
)


@query(
    "graph_config_triangles",
    # Real oracle: observed triangles and the degree sums S1/S2 are
    # integers on the shared support-thresholded edge list; the
    # configuration-model expectation (S2/S1)^3/6 and the ratio are
    # one closed form each, rounded on the shared grid.
    oracle=f"""
    WITH {DUCK_COPURCHASE_SYM},
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM ce a JOIN ce b ON b.p1 = a.p2
                 JOIN ce c ON c.p1 = a.p1 AND c.p2 = b.p2),
    deg AS (SELECT p1 AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM csym GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(SUM(d) AS BIGINT) AS s1,
                 CAST(SUM(d * (d - 1)) AS BIGINT) AS s2
          FROM deg),
    x AS (SELECT s.*, tri.t,
                 CASE WHEN s1 = 0 THEN 0.0
                      ELSE POWER(CAST(s2 AS DOUBLE) / s1, 3) / 6
                 END AS et
          FROM s, tri)
    SELECT n_nodes, s1 // 2 AS n_edges, t AS triangles,
           FLOOR(et * 1e4 + 0.5) / 1e4 AS expected_triangles,
           FLOOR(CASE WHEN et <= 0 THEN 0.0 ELSE t / et END * 1e4 + 0.5)
             / 1e4 AS surprise_ratio
    FROM x
    """,
)
def graph_config_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle significance against the configuration model: count
    closed triangles on the support-thresholded co-purchase graph and
    compare with the degree-sequence-only expectation
    E[T] = (1/6)(S2/S1)^3, S1 = sum(d), S2 = sum(d(d-1)). A
    surprise_ratio near 1 means the observed closure is what random
    stub-matching with these degrees already produces — hubs faking
    community; well above 1 certifies genuine clustering pressure.
    The one-number justification for running community detection at
    all (graph_clustering_coeff reports the level; this scores it).

    Scale: one wedge join on the deduplicated oriented edge list for
    T, one degree aggregation for S1/S2 — both map-side combinable;
    the model algebra is a 1-row closed form."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    a, b, cc = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(b, F.col("b.p1") == F.col("a.p2"))
        .join(
            cc,
            (F.col("c.p1") == F.col("a.p1")) & (F.col("c.p2") == F.col("b.p2")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    sym = e.unionByName(
        e.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    )
    deg = sym.groupBy(F.col("p1").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    s = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("d").cast("bigint").alias("s1"),
        F.sum(F.col("d") * (F.col("d") - 1)).cast("bigint").alias("s2"),
    )
    et = F.when(F.col("s1") == 0, F.lit(0.0)).otherwise(
        F.pow(F.col("s2").cast("double") / F.col("s1"), 3) / 6
    )
    return s.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        (F.col("s1") / 2).cast("bigint").alias("n_edges"),
        F.col("t").alias("triangles"),
        rnd(et, 4).alias("expected_triangles"),
        rnd(
            F.when(et <= 0, F.lit(0.0)).otherwise(F.col("t") / et), 4
        ).alias("surprise_ratio"),
    )
