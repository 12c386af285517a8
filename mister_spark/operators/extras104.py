"""Wave 104: distributed minimum spanning forest, partitioning-hint
surface, and bounce-rate analytics.

graph_mst_boruvka builds the minimum spanning forest of the weighted
co-purchase graph with Borůvka rounds — every component picks its
cheapest outgoing edge simultaneously, components merge, repeat:
the MST algorithm that actually parallelizes (Prim's frontier
doesn't); sql_hints_surface pins the REPARTITION / COALESCE /
REBALANCE / BROADCAST hint family in the physical plan — the
explicit levers for the shuffles Catalyst won't infer;
ev_bounce_rate computes per-entry-type session bounce rates on the
exact sessionize construction — the landing-quality number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import _copurchase_edges
from mister_spark.operators.extras47 import COP_SUPPORT, _DUCK_BASKETS
from mister_spark.registry import query

MST_MAX_ROUNDS = 6
SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "graph_mst_boruvka",
    # Real oracle: Borůvka with the strict (cost, u, v) total order
    # picks the UNIQUE minimum spanning forest of the perturbed
    # weights — the same forest Kruskal under that order accepts. The
    # CTE replays Kruskal: edges ranked by (cost, u, v), one edge per
    # iteration, the full label relation carried and union-by-min
    # relabeled (multi-ref recursion looks up both endpoint labels);
    # accepted edges are recovered post-hoc as those whose endpoints
    # disagreed at it = rank - 1.
    oracle=f"""
    WITH RECURSIVE {_DUCK_BASKETS},
    cew AS (SELECT p1 AS u, p2 AS v, 1.0 / w AS cost FROM (
              SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                     CAST(COUNT(*) AS DOUBLE) AS w
              FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2) q WHERE w >= {COP_SUPPORT}),
    re AS MATERIALIZED (SELECT u, v, cost,
                 CAST(ROW_NUMBER() OVER (ORDER BY cost, u, v) AS INT)
                   AS rn
          FROM cew),
    nodes AS (SELECT DISTINCT u AS node FROM (
                SELECT u FROM cew UNION ALL SELECT v FROM cew) q),
    ne AS (SELECT CAST(COUNT(*) AS INT) AS n FROM re),
    kr AS (
      SELECT 0 AS it, node, node AS lab FROM nodes
      UNION ALL
      SELECT k.it + 1, k.node,
             CASE WHEN k.lab = a.lab OR k.lab = b.lab
                  THEN LEAST(a.lab, b.lab) ELSE k.lab END
      FROM kr k
      JOIN re e ON e.rn = k.it + 1
      JOIN kr a ON a.node = e.u
      JOIN kr b ON b.node = e.v
      CROSS JOIN ne
      WHERE k.it < ne.n),
    acc AS (SELECT e.rn, e.cost FROM re e
            JOIN kr a ON a.it = e.rn - 1 AND a.node = e.u
            JOIN kr b ON b.it = e.rn - 1 AND b.node = e.v
            WHERE a.lab <> b.lab),
    fin AS (SELECT COUNT(DISTINCT lab) AS comps FROM kr, ne
            WHERE it = ne.n),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)
    SELECT nn.n AS nodes, CAST(fin.comps AS BIGINT) AS components,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM acc) AS tree_edges,
           FLOOR((SELECT COALESCE(SUM(cost), 0.0) FROM acc)
                 * 10000 + 0.5) / 10000 AS total_cost
    FROM nn, fin
    """,
)
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the co-purchase graph (edge cost =
    1/shared-orders, so strong ties are cheap) via Borůvka rounds:
    every component selects its minimum outgoing edge (deterministic
    tie-break on (cost, u, v)), selected edges join the forest,
    components merge by hash-to-min relabeling, repeat until no
    component has an outgoing edge. Emits forest summary: components,
    tree edges, total cost — the backbone extraction behind cluster
    merging and network design.

    Scale: each round is two joins (label lookup) + one min_by
    aggregate per component + the pointer-jump relabel, all
    localCheckpoint-ed (components precedent); rounds are O(log n)
    because components at least halve."""
    e = _copurchase_edges(spark, sf_dir).select(
        F.col("p1").alias("u"),
        F.col("p2").alias("v"),
        (1.0 / F.col("w")).alias("cost"),
    ).localCheckpoint()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    lab = nodes.withColumn("lab", F.col("node")).localCheckpoint()
    chosen = None
    for _ in range(MST_MAX_ROUNDS):
        lu = lab.select(F.col("node").alias("u"), F.col("lab").alias("cu"))
        lv = lab.select(F.col("node").alias("v"), F.col("lab").alias("cv"))
        ee = (
            e.join(lu, "u")
            .join(lv, "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        if ee.limit(1).count() == 0:
            break
        # min outgoing edge per component (both directions considered)
        cand = ee.select(
            F.col("cu").alias("comp"), "u", "v", "cost", F.col("cv").alias("other")
        ).unionByName(
            ee.select(
                F.col("cv").alias("comp"),
                "u",
                "v",
                "cost",
                F.col("cu").alias("other"),
            )
        )
        pick = cand.groupBy("comp").agg(
            F.min_by(
                F.struct("cost", "u", "v", "other"),
                F.struct("cost", "u", "v"),
            ).alias("m")
        ).select(
            F.col("m.u").alias("u"),
            F.col("m.v").alias("v"),
            F.col("m.cost").alias("cost"),
        ).distinct()
        chosen = (
            pick if chosen is None else chosen.unionByName(pick)
        ).localCheckpoint()
        # merge: components connected by picked edges take the min label
        pe = pick.join(
            lab.select(F.col("node").alias("u"), F.col("lab").alias("cu")), "u"
        ).join(
            lab.select(F.col("node").alias("v"), F.col("lab").alias("cv")), "v"
        )
        relink = pe.select(
            F.col("cu").alias("old"),
            F.least("cu", "cv").alias("new"),
        ).unionByName(
            pe.select(F.col("cv").alias("old"), F.least("cu", "cv").alias("new"))
        ).groupBy("old").agg(F.min("new").alias("new"))
        for _jump in range(3):  # pointer jumping to collapse chains
            relink = (
                relink.alias("a")
                .join(
                    relink.select(
                        F.col("old").alias("new"), F.col("new").alias("new2")
                    ),
                    "new",
                    "left",
                )
                .select(
                    F.col("old"),
                    F.coalesce("new2", "new").alias("new"),
                )
                .groupBy("old")
                .agg(F.min("new").alias("new"))
            )
        lab = (
            lab.join(
                relink.withColumnRenamed("old", "lab"), "lab", "left"
            )
            .select(
                "node", F.coalesce("new", F.col("lab")).alias("lab")
            )
            .localCheckpoint()
        )
    chosen = chosen.distinct() if chosen is not None else None
    n_nodes = nodes.count()
    n_comp = lab.select("lab").distinct().count()
    n_edges = chosen.count() if chosen is not None else 0
    total = (
        chosen.agg(F.sum("cost")).collect()[0][0] if chosen is not None else 0.0
    )
    import math

    row = (
        int(n_nodes),
        int(n_comp),
        int(n_edges),
        math.floor(float(total or 0.0) * 10000 + 0.5) / 10000,
    )
    return spark.createDataFrame(
        [row], "nodes long, components long, tree_edges long, total_cost double"
    )


@query(
    "sql_hints_surface",
    # Real oracle: the hint variants must agree with the plain rollup -
    # distinct customers per grouping, every order joined (the FK is
    # total), identical across hints.
    oracle="""
    WITH g AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS k,
                      CAST(COUNT(*) AS BIGINT) AS n FROM orders)
    SELECT k AS groups_repartition, k AS groups_coalesce,
           n AS joined_rows, CAST(1 AS BIGINT) AS variants_agree
    FROM g
    """,
)
def sql_hints_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning-hint surface: the same aggregate written with (a)
    a REPARTITION(8, key) hint (explicit exchange), (b) a COALESCE(2)
    hint (shrink without shuffle), and (c) a BROADCAST hint on a dim
    join — each verified to land in the physical plan by the pytest
    gate. These are the levers for the cases Catalyst can't infer:
    known output-file counts, known dim sizes above the auto
    threshold, deliberate co-partitioning.

    Scale: the hints ARE the scale story; the result row just proves
    the three variants agree."""
    c = cat(spark, sf_dir)
    c["orders"].createOrReplaceTempView("_h_orders")
    c["customer"].createOrReplaceTempView("_h_cust")
    rep = spark.sql(
        """
        SELECT /*+ REPARTITION(8, o_custkey) */ o_custkey,
               COUNT(*) AS n FROM _h_orders GROUP BY 1
        """
    )
    coal = spark.sql(
        """
        SELECT /*+ COALESCE(2) */ o_custkey,
               COUNT(*) AS n FROM _h_orders GROUP BY 1
        """
    )
    bc = spark.sql(
        """
        SELECT /*+ BROADCAST(_h_cust) */ COUNT(*) AS n
        FROM _h_orders JOIN _h_cust ON o_custkey = c_custkey
        """
    )
    n1 = rep.count()
    n2 = coal.count()
    n3 = bc.collect()[0]["n"]
    row = (int(n1), int(n2), int(n3), int(n1 == n2))
    return spark.createDataFrame(
        [row],
        "groups_repartition long, groups_coalesce long, joined_rows long, "
        "variants_agree long",
    )


@query(
    "ev_bounce_rate",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events),
    flagged AS (
      SELECT user_id, event_type, tus, event_id,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus, event_id)
                       > {SESSION_GAP_US}
                  OR LAG(tus) OVER (PARTITION BY user_id
                                    ORDER BY tus, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, event_type, tus, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged),
    sess2 AS (
      SELECT user_id, sess_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
                                ORDER BY tus, event_id) AS rn
      FROM sess),
    agg AS (
      SELECT user_id, sess_id,
             MIN_BY(event_type, rn) AS entry_type,
             COUNT(*) AS n_events
      FROM sess2 GROUP BY 1, 2)
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bounces,
           FLOOR(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS bounce_rate
    FROM agg GROUP BY 1
    """,
)
def ev_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: sessions built with the
    exact ev_sessionize gap rule (30-min inactivity), a bounce =
    single-event session, grouped by the session's FIRST event type —
    which landing actions fail to start a journey.

    Scale: the sessionize exchange (one shuffle on user_id) feeds the
    gap flags, the session ids, and the per-session rollup; the
    entry-type report is a |types|-row aggregate."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = t.withColumn(
        "new_sess",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_US)
            | F.lag("tus").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    w2 = W.partitionBy("user_id", "sess_id").orderBy("tus", "event_id")
    sess2 = sess.withColumn("rn", F.row_number().over(w2))
    agg = sess2.groupBy("user_id", "sess_id").agg(
        F.min_by("event_type", "rn").alias("entry_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("bigint")
        .alias("bounces"),
        ratio(
            F.sum((F.col("n_events") == 1).cast("double"))
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
    )
